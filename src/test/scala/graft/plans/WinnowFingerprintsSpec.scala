package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WinnowFingerprintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Mask = 0xFFFFFFFFL

  /** Reference implementation: from-scratch k-gram hashes + window
    * minima (what the DuckDB oracle states), no rolling recurrence. */
  private def brute(s: String, k: Int, w: Int): Seq[Long] = {
    val nk = s.length - k + 1
    if (nk - w + 1 < 1) return Seq.empty
    val hs = (0 until nk).map { i =>
      s.substring(i, i + k).foldLeft(-1L) { (h, c) =>
        if (h < 0) c.toLong else (h * 31 + c) & Mask
      }
    }
    (0 to nk - w).map(j => hs.slice(j, j + w).min).distinct.sorted
  }

  private def native(texts: Seq[String], k: Int, w: Int): Seq[Seq[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"),
        WinnowFingerprintsExpr.winnowFingerprints(spark, col("text"), k, w).as("fp"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq

  test("rolling recurrence == from-scratch hashing on varied inputs") {
    val rnd = new scala.util.Random(7)
    val texts = Seq("", "a", "abcdefg", "abcdefgh", "abcdbcdaab",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 20).map(_ => rnd.alphanumeric.take(rnd.nextInt(120)).mkString)
    for ((k, w) <- Seq((8, 4), (3, 2), (1, 1), (5, 10))) {
      val got = native(texts, k, w)
      texts.zip(got).foreach { case (t, fp) =>
        assert(fp == brute(t, k, w), s"k=$k w=$w text='$t'")
      }
    }
  }

  test("shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    val core = "GUARANTEED-COMMON-SUBSTRING-XYZ" // 31 chars >= 8+4-1
    val a = s"left padding ${core} some tail here"
    val b = s"totally different prefix ${core} and suffix"
    val Seq(fa, fb) = native(Seq(a, b), 8, 4)
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }

  test("stays inside whole-stage codegen (no fallback barrier)") {
    // a real scan, not a local relation (which constant-folds the
    // expression at plan time)
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(WinnowFingerprintsExpr.winnowFingerprints(spark, col("text"), 8, 4)
        .as("fp"))
      .filter(size(col("fp")) >= 0)
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" prefixes mark operators fused into a WholeStageCodegen
    // stage in the compact plan rendering
    assert(plan.contains("*(1) Project [winnow_fingerprints"), plan)
    assert(df.count() == 500)
  }

  test("null text -> null; short text -> empty array") {
    val df = Seq((1L, null: String), (2L, "abc")).toDF("id", "text")
      .select(col("id"),
        WinnowFingerprintsExpr.winnowFingerprints(spark, col("text"), 8, 4).as("fp"))
      .orderBy("id").collect()
    assert(df(0).isNullAt(1))
    assert(df(1).getSeq[Long](1).isEmpty)
  }
}
