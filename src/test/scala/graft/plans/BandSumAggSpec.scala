package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark
import graft.ops.{HistogramOps => H}

case class BandRow(g: Int, weeks: Option[Seq[Option[Long]]])

class BandSumAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 8

  private val rowGen = for {
    g <- Gen.choose(0, 2)
    // arrays shorter OR longer than B, null slots, whole-null arrays
    arr <- Gen.option(Gen.choose(0, B + 3).flatMap(n =>
      Gen.listOfN(n, Gen.option(Gen.choose(-5L, 100L)))))
  } yield BandRow(g, arr)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("band_sum == HistogramOps.sumBands on arbitrary histograms") {
    val rows = samples(rowGen, 200)
    val df = rows.toDF()
    val native = df.groupBy("g")
      .agg(BandSumAgg.bandSum(spark, col("weeks"), B).as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    val hof = df.groupBy("g")
      .agg(H.sumBands(col("weeks"), B).as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(native.toSeq == hof.toSeq)
  }

  test("empty groups and all-null arrays yield zero vectors (sumnarm)") {
    val df = Seq(
      BandRow(1, None),
      BandRow(1, Some(Seq(None, None)))).toDF()
    val got = df.groupBy("g")
      .agg(BandSumAgg.bandSum(spark, col("weeks"), B).as("s"))
      .head.getSeq[Long](1)
    assert(got == Seq.fill(B)(0L))
  }

  test("SQL registration + partial aggregation (map-side combine) in the plan") {
    BandSumAgg.register(spark)
    Seq(BandRow(1, Some(Seq(Some(1L), Some(2L)))),
      BandRow(1, Some(Seq(Some(3L)))),
      BandRow(2, Some(Seq(Some(5L)))))
      .toDF().createOrReplaceTempView("band_rows")
    val out = spark.sql(
      s"SELECT g, band_sum(weeks, $B) AS s FROM band_rows GROUP BY g ORDER BY g")
    val rows = out.collect().map(r => (r.getInt(0), r.getSeq[Long](1).take(2)))
    assert(rows.toSeq == Seq((1, Seq(4L, 2L)), (2, Seq(5L, 0L))))
    // typed-imperative aggregates plan as ObjectHashAggregate with a
    // partial pass before the exchange — shuffle carries pre-combined
    // group vectors, not rows
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_band_sum"), plan)
  }
}
