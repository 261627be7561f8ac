package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.dedup.Dedup

class BloomFilterOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("no false negatives; false positives near fpp") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => s"key-$i")
    val bloom = BloomFilterOps.buildBloom(
      members.toDF("k"), col("k"), expectedItems = 2000L, fpp = 0.01)
    val probes = (0L until 10000L).map(i => s"key-$i").toDF("k")
      .withColumn("hit",
        BloomFilterOps.mightContain(spark, bloom, col("k")))
    val hits = probes.filter(col("hit")).count()
    // all 2000 members MUST hit; of the 8000 non-members ~1% may
    assert(hits >= 2000, s"false negative: only $hits hits")
    assert(hits <= 2000 + 400, s"fpp blowout: ${hits - 2000} FPs of 8000")
  }

  test("empty build side rejects every probe") {
    import spark.implicits._
    val bloom = BloomFilterOps.buildBloom(
      Seq.empty[String].toDF("k"), col("k"), expectedItems = 0L)
    val hits = Seq("a", "b").toDF("k")
      .filter(BloomFilterOps.mightContain(spark, bloom, col("k"))).count()
    assert(hits === 0)
  }

  test("buildBlooms: each filter of the one-pass build matches its " +
      "single-build twin's contract (no false negatives, fpp bounded)") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (s"key-$i", i)).toDF("k", "v")
    val Seq(bk, bv) = BloomFilterOps.buildBlooms(
      df, Seq(col("k"), col("v")), expectedItems = 2000L, fpp = 0.01)
    val kHits = (0L until 10000L).map(i => s"key-$i").toDF("k")
      .filter(BloomFilterOps.mightContain(spark, bk, col("k"))).count()
    assert(kHits >= 2000 && kHits <= 2400, s"k filter: $kHits")
    val vHits = (0L until 10000L).toDF("v")
      .filter(BloomFilterOps.mightContain(spark, bv, col("v"))).count()
    assert(vHits >= 2000 && vHits <= 2400, s"v filter: $vHits")
    // empty input: every filter still rejects everything
    val Seq(e1, e2) = BloomFilterOps.buildBlooms(
      Seq.empty[String].toDF("k").withColumn("v", lit(1L)),
      Seq(col("k"), col("v")), expectedItems = 0L)
    assert(Seq("a").toDF("k")
      .filter(BloomFilterOps.mightContain(spark, e1, col("k"))).count() === 0)
    assert(Seq(1L).toDF("v")
      .filter(BloomFilterOps.mightContain(spark, e2, col("v"))).count() === 0)
  }

  test("bloom pre-pruned contamination equals the plain join exactly") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("train_id", "eval_id", "shared").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = pairs(Dedup.contaminationPairs(
      train, eval, "doc_id", "text", n = 3, minShared = 2))
    val bloomed = pairs(Dedup.contaminationPairsBloom(
      train, eval, "doc_id", "text", n = 3, minShared = 2))
    assert(plain.nonEmpty, "fixture should contain contamination pairs")
    assert(bloomed === plain)
  }
}
