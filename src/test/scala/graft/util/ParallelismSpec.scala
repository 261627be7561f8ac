package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ParallelismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("single-split input fans out to the session parallelism") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val one = (1 to 100).toDF("v").coalesce(1)
      assert(one.rdd.getNumPartitions === 1)
      val out = Parallelism.fanOut(one)
      assert(out.rdd.getNumPartitions === 32)
      // row set unchanged
      assert(out.collect().map(_.getInt(0)).sorted === (1 to 100).toArray)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("near-target split counts are left alone (threshold is target/4)") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val eight = (1 to 100).toDF("v").repartition(8)
      assert(Parallelism.fanOut(eight).rdd.getNumPartitions === 8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("well-split input is returned untouched (no added shuffle)") {
    import spark.implicits._
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wide = (1 to 100).toDF("v").repartition(target)
    val out = Parallelism.fanOut(wide)
    // same plan object semantics: partition count unchanged and no
    // extra exchange on top of the existing one
    assert(out.rdd.getNumPartitions === target)
    assert(out.queryExecution.executedPlan.toString ===
      wide.queryExecution.executedPlan.toString)
  }
}
