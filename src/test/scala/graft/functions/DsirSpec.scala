package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the rug", "en"),
      (3L, "le chat dort sur le tapis", "fr"),
      (4L, "le chien dort sur le lit", "fr"),
      (5L, "the cat dort", "de"),
      (6L, "", "en")).toDF("doc_id", "text", "lang")
  }

  test("featureBucket is the md5-hex fold mod buckets") {
    import spark.implicits._
    val got = Seq("hello", "world foo", "café", "a b").toDF("g")
      .select(Dsir.featureBucket(col("g"), 4096).as("b"))
      .collect().map(_.getLong(0)).toSeq
    // values computed independently in DuckDB with the oracle's
    // list_sum fold over the same md5 hex prefixes
    assert(got == Seq(42L, 2213L, 4068L, 3405L))
  }

  test("weight table is dense, bounded, and masses cover all grams") {
    val target = corpus.filter(col("lang") === "en")
    val w = Dsir.importanceWeights(corpus, target, "text", buckets = 64)
    val rows = w.collect()
    assert(rows.length == 64) // dense spine: every bucket present
    // total gram occurrences: per doc with k tokens -> 2k-1 grams
    // docs: 6,6,6,6,3,0 tokens -> 11+11+11+11+5+0 = 49 raw grams
    assert(rows.map(_.getAs[Long]("rc")).sum == 49L)
    // target (en): docs 1,2,6 -> 11+11+0 = 22 grams
    assert(rows.map(_.getAs[Long]("tc")).sum == 22L)
  }

  test("scores rank target-like docs above off-target docs; empty doc scores 0") {
    val target = corpus.filter(col("lang") === "en")
    val s = Dsir.scores(corpus, target, "doc_id", "text", buckets = 4096)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("score")))).toMap
    assert(s(6L) == ((0L, 0L)))
    // pure-English docs must outscore pure-French docs against an
    // English target distribution
    val en = Seq(1L, 2L).map(s(_)._2).min
    val fr = Seq(3L, 4L).map(s(_)._2).max
    assert(en > fr, s"en min $en should exceed fr max $fr")
    // the mixed doc sits strictly between
    assert(s(5L)._2 < en && s(5L)._2 > fr)
  }

  test("selectTop takes the argmax set with deterministic tie-break") {
    val target = corpus.filter(col("lang") === "en")
    val scored = Dsir.scores(corpus, target, "doc_id", "text")
    val picked = Dsir.selectTop(scored, "doc_id", 3)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(1L, 2L, 5L))
    // end-to-end wrapper agrees
    val picked2 = Dsir.select(corpus, target, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSet
    assert(picked2 == picked)
  }
}
