package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-computed contracts for [[AsOfJoin]] (backward as-of) and
  * [[RangeJoin]] (binned point-in-interval). */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asof(tol: Option[org.apache.spark.sql.Column] = None) = {
    val left = Seq( // (key, t, tag)
      ("a", 10L, "p1"), ("a", 20L, "p2"), ("a", 5L, "p0"),
      ("b", 100L, "p3"), ("c", 7L, "p4")).toDF("k", "t", "tag")
    val right = Seq( // (key, t, v)
      ("a", 10L, 1L), ("a", 15L, 2L), ("a", 30L, 3L),
      ("b", 99L, 4L)).toDF("k", "rt", "v")
    AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"),
      rightTimeOut = "mt", tolerance = tol)
      .orderBy("tag")
      .select("tag", "mt", "v")
      .collect().toSeq
  }

  test("backward picks latest right at-or-before each left; no match -> nulls") {
    assert(asof() == Seq(
      Row("p0", null, null),        // a@5: no right <= 5
      Row("p1", 10L, 1L),           // a@10: equality match included
      Row("p2", 15L, 2L),           // a@20: latest of {10,15}
      Row("p3", 99L, 4L),           // b@100
      Row("p4", null, null)))       // c: key absent on right
  }

  test("tolerance nulls out stale matches but keeps the row") {
    // p2 matches rt=15 at distance 5; p3 matches rt=99 at distance 1
    assert(asof(Some(lit(1L))) == Seq(
      Row("p0", null, null),
      Row("p1", 10L, 1L),           // distance 0 <= 1
      Row("p2", null, null),        // distance 5 > 1 -> nulled, row kept
      Row("p3", 99L, 4L),
      Row("p4", null, null)))
  }

  test("null payload FIELDS still win the as-of race (struct carrier)") {
    val left = Seq(("a", 20L)).toDF("k", "t")
    val right = Seq(("a", 5L, Some(7L)), ("a", 10L, Option.empty[Long]))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"),
      rightTimeOut = "mt").select("mt", "v").head
    // the rt=10 row is the match even though its v is null — a bare
    // last(v, ignoreNulls) would wrongly resurrect v=7 from rt=5
    assert(out.getLong(0) == 10L && out.isNullAt(1))
  }

  test("equals the inequality-join spec on a random corpus") {
    val n = 500
    val left = spark.range(n).select(
      (col("id") % 7).as("k"), pmod(col("id") * 37 + 11, lit(1000)).as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 7).as("k"), pmod(col("id") * 53 + 5, lit(1000)).as("rt"),
      col("id").as("v"))
      // unique (k, rt): ties among right rows make "the" match ambiguous
      .groupBy("k", "rt").agg(max("v").as("v"))
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"),
      rightTimeOut = "mt")
    // spec: max rt <= t, then its v
    left.createOrReplaceTempView("L"); right.createOrReplaceTempView("R")
    val want = spark.sql(
      """SELECT L.lid, m.mt, R2.v FROM L
        |LEFT JOIN (SELECT L.lid AS lid2, max(R.rt) AS mt FROM L
        |           JOIN R ON L.k = R.k AND R.rt <= L.t GROUP BY L.lid) m
        |  ON L.lid = m.lid2
        |LEFT JOIN R R2 ON R2.k = L.k AND R2.rt = m.mt""".stripMargin)
    val g = got.select("lid", "mt", "v").collect().map(r => r.toSeq).sortBy(_.head.toString.toLong)
    val w = want.collect().map(r => r.toSeq).sortBy(_.head.toString.toLong)
    assert(g.toSeq == w.toSeq)
  }

  test("range join: closed ends, bin-crossing intervals, each match once") {
    val points = Seq(("a", 0L, "x0"), ("a", 10L, "x1"), ("a", 25L, "x2"),
      ("a", 31L, "x3"), ("b", 10L, "x4")).toDF("k", "t", "ptag")
    val ivals = Seq(("a", 10L, 30L, "i1"), ("a", 0L, 99L, "i2"),
      ("b", 11L, 12L, "i3")).toDF("k", "t0", "t1", "itag")
    val got = RangeJoin.pointInInterval(points, ivals, Seq("k"),
        "t", "t0", "t1", binWidth = 7L)
      .select("ptag", "itag").as[(String, String)].collect().toSet
    assert(got == Set(
      ("x0", "i2"),                    // t=0 == start, closed
      ("x1", "i1"), ("x1", "i2"),      // multi-interval match, no dups
      ("x2", "i1"), ("x2", "i2"),
      ("x3", "i2")))                   // t=31 > 30, i1 end excluded? no: 31>30 out
  }

  test("nulls never match: null right time/key filtered, null left kept") {
    val left = Seq((Some("a"), Some(20L), "ok"), (None, Some(20L), "nullkey"),
      (Some("a"), Option.empty[Long], "nulltime")).toDF("k", "t", "tag")
    val right = Seq( // null rt / null key rows must never win the race
      (Some("a"), Option.empty[Long], 666L), (Option.empty[String], Some(1L), 777L),
      (Some("a"), Some(10L), 1L)).toDF("k", "rt", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"),
        rightTimeOut = "mt")
      .select("tag", "mt", "v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got == Set(
      ("ok", 10L, 1L),         // the only valid right row wins
      ("nullkey", null, null), // left null key: kept, no-match path
      ("nulltime", null, null))) // left null time: kept, no-match path
  }

  test("range join refuses ambiguous non-key columns on both sides") {
    val points = Seq(("a", 1L, "x")).toDF("k", "t", "tag")
    val ivals = Seq(("a", 0L, 2L, "y")).toDF("k", "t0", "t1", "tag")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "t0", "t1", 5L)
    }
    assert(e.getMessage.contains("tag"))
  }

  test("range join fails loudly on a degenerate interval, not with OOM") {
    val points = Seq(("a", 1L)).toDF("k", "t")
    val ivals = Seq(("a", 0L, Long.MaxValue / 2)).toDF("k", "t0", "t1")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "t0", "t1",
        binWidth = 5L, maxBinsPerInterval = 1000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("raise binWidth")))
  }

  test("range join handles negative times (floor, not truncate, binning)") {
    val points = Seq(("a", -8L, "p"), ("a", -1L, "q")).toDF("k", "t", "ptag")
    val ivals = Seq(("a", -9L, -2L, "i")).toDF("k", "t0", "t1", "itag")
    val got = RangeJoin.pointInInterval(points, ivals, Seq("k"),
        "t", "t0", "t1", binWidth = 5L)
      .select("ptag").as[String].collect().toSet
    assert(got == Set("p")) // -8 in [-9,-2]; -1 outside
  }
}
