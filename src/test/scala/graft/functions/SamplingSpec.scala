package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("splitLabel partitions every key into exactly one split, near the target fractions") {
    import spark.implicits._
    val n = 100000L
    val df = spark.range(n).toDF("id")
      .withColumn("split", Sampling.splitLabel(col("id")))
    val counts = df.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    assert(math.abs(counts("train") - 80000L) < 2000, counts.toString)
    assert(math.abs(counts("valid") - 10000L) < 1000, counts.toString)
    assert(math.abs(counts("test") - 10000L) < 1000, counts.toString)
  }

  test("split membership is a pure function of the key (repartition-invariant)") {
    import spark.implicits._
    val base = spark.range(10000).toDF("id")
    def labels(parts: Int): Map[Long, String] =
      base.repartition(parts)
        .withColumn("split", Sampling.splitLabel(col("id")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels(2) == labels(17))
  }

  test("sampled keeps ~keepBp/10000 and is a subset relation across rates") {
    import spark.implicits._
    val df = spark.range(100000).toDF("id")
    val at1pct = df.filter(Sampling.sampled(col("id"), 100))
      .collect().map(_.getLong(0)).toSet
    val at5pct = df.filter(Sampling.sampled(col("id"), 500))
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(at1pct.size - 1000) < 300, at1pct.size.toString)
    assert(at1pct.subsetOf(at5pct), "raising the rate must only ADD rows")
  }

  test("splitLabel rejects fractions over 100%") {
    intercept[IllegalArgumentException] {
      Sampling.splitLabel(lit(1L), trainBp = 9000, validBp = 2000)
    }
  }
}
