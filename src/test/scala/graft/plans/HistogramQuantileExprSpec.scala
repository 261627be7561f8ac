package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark
import graft.ops.HistogramOps

/** The native expression must agree exactly with the HOF composition
  * (the oracle-verified reference semantics) on arbitrary histograms.
  * Property inputs come from scalacheck generators sampled with fixed
  * seeds (the scalatest<->scalacheck bridge isn't on the offline
  * classpath). */
class HistogramQuantileExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val histGen: Gen[List[Long]] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 50L)))
  private val qGen: Gen[Double] = Gen.chooseNum(0.01, 1.0)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("expression == HOF composition on arbitrary histograms and quantiles") {
    // evaluate all samples in ONE job (collect per-sample spark jobs
    // would dominate runtime)
    val cases = samples(Gen.zip(histGen, qGen), 40)
    val df = cases.toDF("weeks", "q")
      .withColumn("total", aggregate(col("weeks"), lit(0L), (a, x) => a + x))
    HistogramQuantileExpr.register(spark)
    val rows = df.select(
      HistogramOps.quantile(HistogramOps.cumulative(col("weeks")),
        col("total"), 0.5).as("hof_50"),
      expr("histogram_quantile(weeks, total, 0.5d)").as("native_50"),
      HistogramOps.histogramQuantile(col("weeks"), col("total"), 0.92).as("hof_92"),
      expr("histogram_quantile(weeks, total, 0.92d)").as("native_92"),
      expr("histogram_quantile(weeks, total, q)").as("native_q")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
      assert(r.isNullAt(2) == r.isNullAt(3))
      if (!r.isNullAt(2)) assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("quantile is monotone in q and bounded by band count") {
    val hists = samples(histGen, 30).filter(_.sum > 0)
    HistogramQuantileExpr.register(spark)
    val rows = hists.map(Tuple1(_)).toDF("weeks")
      .withColumn("total", aggregate(col("weeks"), lit(0L), (a, x) => a + x))
      .select(size(col("weeks")).as("n"),
        expr("histogram_quantile(weeks, total, 0.1d)").as("q10"),
        expr("histogram_quantile(weeks, total, 0.5d)").as("q50"),
        expr("histogram_quantile(weeks, total, 0.9d)").as("q90"),
        expr("histogram_quantile(weeks, total, 1.0d)").as("q100"))
      .collect()
    rows.foreach { r =>
      val qs = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(qs == qs.sorted)
      assert(qs.forall(v => v >= 0 && v <= r.getInt(0)))
    }
  }

  test("SQL registration + codegen plan") {
    HistogramQuantileExpr.register(spark)
    // non-literal, HOF-free input (transform/aggregate are
    // CodegenFallback and would break the stage): the projection with
    // histogram_quantile must carry the `*(n)` codegen marker
    val out = spark.range(100)
      .selectExpr("array(id + 1, id + 2, id + 3) AS weeks",
        "3 * id + 6 AS total")
      .selectExpr("histogram_quantile(weeks, total, 0.5d) AS m")
    assert(out.count() == 100 && !out.head.isNullAt(0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
    // simple known value through SQL
    val v = spark.sql(
      "SELECT histogram_quantile(array(5L, 5L, 10L), 20L, 0.5d) AS m")
    assert(v.head.getLong(0) == 1L) // target 10 = cum[2] -> band 2 - 1
  }

  test("null/zero handling") {
    HistogramQuantileExpr.register(spark)
    val df = Seq(
      (Some(Seq(0L, 0L)), Some(0L)),
      (None, Some(10L)),
      (Some(Seq(1L, 2L)), None)).toDF("weeks", "total")
    val got = df.selectExpr("histogram_quantile(weeks, total, 0.5d) AS m")
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }
}
