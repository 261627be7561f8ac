package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KgramHashesExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Mask = 0xFFFFFFFFL

  /** Reference: from-scratch per-position k-gram hashes (the DuckDB
    * oracle's fold), no rolling recurrence. */
  private def brute(s: String, k: Int): Seq[Long] = {
    val nk = s.length - k + 1
    if (nk < 1) return Seq.empty
    (0 until nk).map { i =>
      s.substring(i, i + k).foldLeft(-1L) { (h, c) =>
        if (h < 0) c.toLong else (h * 31 + c) & Mask
      }
    }
  }

  private def native(texts: Seq[String], k: Int): Seq[Seq[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"),
        KgramHashesExpr.kgramHashes(spark, col("text"), k).as("hs"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq

  test("rolling recurrence == from-scratch hashing, position-aligned") {
    val rnd = new scala.util.Random(11)
    val texts = Seq("", "a", "abcdefg", "abcdefgh", "abcdbcdaab",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 20).map(_ => rnd.alphanumeric.take(rnd.nextInt(120)).mkString)
    for (k <- Seq(1, 3, 8, 20)) {
      val got = native(texts, k)
      texts.zip(got).foreach { case (t, hs) =>
        assert(hs == brute(t, k), s"k=$k text='$t'")
      }
    }
  }

  test("winnow minima are a subset of the positional hash set (same family)") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val Seq(pos) = native(Seq(t), 8)
    val winnow = Seq(t).toDF("text")
      .select(WinnowFingerprintsExpr.winnowFingerprints(spark, col("text"), 8, 4))
      .head().getSeq[Long](0).toSet
    assert(winnow.subsetOf(pos.toSet))
  }
}
