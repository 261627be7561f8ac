package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.{HistogramOps => H, RelationalOps => R}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cumulative treats nulls as zero and preserves length") {
    val df = Seq(Seq[java.lang.Long](1L, null, 2L)).toDF("w")
      .select(H.cumulative($"w").as("c"))
    assert(df.head.getSeq[Long](0) == Seq(1L, 1L, 3L))
  }

  test("quantile: zero/empty histogram returns null, monotone in q") {
    val df = Seq((Seq(0L, 0L, 0L), 0L)).toDF("w", "t")
      .select(H.histogramQuantile($"w", $"t", 0.5).as("q"))
    assert(df.head.isNullAt(0))
    val w = Seq(1L, 1L, 1L, 1L)
    val qs = Seq(0.25, 0.5, 0.75, 1.0).map { q =>
      Seq((w, 4L)).toDF("w", "t")
        .select(H.histogramQuantile($"w", $"t", q)).head.getLong(0)
    }
    assert(qs == qs.sorted && qs.head == 0L && qs.last == 3L)
  }

  test("sumBands pads short arrays and skips nulls (era drift, U1)") {
    val df = Seq(
      (1, Seq[java.lang.Long](1L, 2L)),
      (1, Seq[java.lang.Long](10L, null, 30L))).toDF("g", "w")
      .groupBy($"g").agg(H.sumBands($"w", 4).as("s"))
    assert(df.head.getSeq[Long](1) == Seq(11L, 2L, 30L, 0L))
  }

  test("weightedMean drops null pairs like R weighted.mean(na.rm=TRUE)") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (3.0, null), (null, 10.0), (5.0, 2.0))
      .toDF("x", "w")
      .agg(R.weightedMean($"x", $"w").as("m"))
    assert(df.head.getDouble(0) == (1.0 * 2 + 5.0 * 2) / 4.0)
    // all pairs invalid -> null, not NaN
    val empty = Seq[(java.lang.Double, java.lang.Double)]((null, 1.0))
      .toDF("x", "w").agg(R.weightedMean($"x", $"w"))
    assert(empty.head.isNullAt(0))
  }

  test("rbindFill nulls missing columns on either side") {
    val a = Seq((1, "x")).toDF("k", "s")
    val b = Seq((2, 9.5)).toDF("k", "d")
    val u = R.rbindFill(Seq(a, b)).orderBy("k").collect()
    assert(u(0).getAs[String]("s") == "x" && u(0).isNullAt(2))
    assert(u(1).isNullAt(1) && u(1).getAs[Double]("d") == 9.5)
  }

  test("dedupKeepFirst is deterministic under the pinned order") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 9, "only"))
      .toDF("k", "ord", "v")
    val d = R.dedupKeepFirst(df, Seq("k"), Seq($"ord".asc))
      .orderBy("k").collect()
    assert(d.map(_.getString(2)).toSeq == Seq("first", "only"))
  }

  test("rate uses banker's rounding (half-to-even, matches R round)") {
    val df = Seq((13L, 80L)).toDF("n", "t")
      .select(H.rate($"n" * 100, $"t" * 100).as("r")) // 16.25 -> 16.2
    assert(df.head.getDouble(0) == 16.2)
    assert(Seq((1L, 0L)).toDF("n", "t")
      .select(H.rate($"n", $"t")).head.isNullAt(0)) // zero denom -> null
  }

  test("pivot_wider preserves mass: sum of pivot cells == pre-pivot sum") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val pre = li.count()
    val pivoted = li.groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O")).agg(count(lit(1)))
    val post = pivoted.select(
      sum(coalesce($"F", lit(0L)) + coalesce($"O", lit(0L)))).head.getLong(0)
    assert(post == pre)
  }

  test("dashboard slices are consistent: IS + Non-IS == All per cell") {
    val cube = graft.queries.StatsQueries.defs("q_dashboard_cube")(
      spark, "/root/testdata/sf0.001").cache()
    val byCell = cube.groupBy("monthyr", "grp", "pathway")
      .agg(
        sum(when($"is_slice" === "All", $"total_patients")).as("all_total"),
        sum(when($"is_slice" =!= "All", $"total_patients")).as("split_total"))
      .collect()
    assert(byCell.nonEmpty)
    byCell.foreach { r =>
      assert(r.getLong(r.fieldIndex("all_total")) ==
        r.getLong(r.fieldIndex("split_total")),
        s"slice mismatch in $r")
    }
  }

  test("countAtOrBelow clamps to short histograms") {
    val df = Seq(Seq(5L, 10L)).toDF("w")
      .select(H.countAtOrBelow(H.cumulative($"w"), 18).as("c"))
    assert(df.head.getLong(0) == 15L)
  }
}
