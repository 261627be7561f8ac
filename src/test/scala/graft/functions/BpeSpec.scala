package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("train: hand-computed merge sequence on a tiny corpus") {
    import spark.implicits._
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the Sennrich
    // paper's running example shape. Round 1 pair counts: (e,s) 9,
    // (s,t) 9, (l,o) 7, (o,w) 7, (w,e) 8 [newest 6 + lower 2], ...
    // tie at 9 between "e<sep>s" and "s<sep>t" -> "e s" wins (e < s).
    val corpus = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest")
    ).flatten.mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList
    assert(merges.take(2) ==
      List((1L, "e", "s", 9L), (2L, "es", "t", 9L)))
    // after (e,s)+(es,t): "est" is one symbol; (w,e) dropped to 2
    // (lower only), (w,est) reads 6 (newest only — widest pairs
    // (d,est)), so the 7-count pairs (l,o)/(o,w) lead; tie breaks to
    // (l,o) ("l" < "o"). Round 4: low is [lo, w] -> (lo,w) at 7 wins.
    assert(merges(2) == ((3L, "l", "o", 7L)))
    assert(merges(3) == ((4L, "lo", "w", 7L)))
    assert(merges.length == 4)
  }

  test("train: greedy non-overlapping pair application (aaa case)") {
    import spark.implicits._
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1: pair (a,a) counts 2 per word x2 words = 4 (overlapping
    // occurrences both count, the get_stats convention)
    val m = Bpe.train(df, "text", numMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList
    assert(m.head == (("a", "a", 4L)))
    // after the merge each word is [aa, a] (greedy left-to-right, NOT
    // [a, aa]) -> round 2 best pair is (aa, a) with count 2
    assert(m(1) == (("aa", "a", 2L)))
  }

  test("segment applies merges rank-ordered; concat invariant holds") {
    import spark.implicits._
    val df = Seq((1L, "newest low a"), (2L, ""), (3L, "aaa")).toDF("doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("a", "a"))
    val got = Bpe.segment(df, "text", merges)
      .select(col("doc_id"), col("bpe_symbols"), col("n_symbols"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(got(1L)._1 == Seq("n", "e", "w", "est", "l", "o", "w", "a"))
    assert(got(1L)._2 == 8L)
    assert(got(2L)._1.isEmpty && got(2L)._2 == 0L)
    assert(got(3L)._1 == Seq("aa", "a"))
    // segmentation never loses characters: concat == the word stream
    val joined = Bpe.segment(df, "text", merges)
      .select(concat_ws("", col("bpe_symbols")).as("j"),
        regexp_replace(trim(col("text")), "\\s+", "").as("w"))
      .collect()
    joined.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("local and distributed merge loops induce identical sequences") {
    import spark.implicits._
    // mixed corpus: repeated words, count ties, self-overlapping runs
    // (aaa/aaaa), shared subwords across words, multi-char growth —
    // every branch of the induction (tie-break, greedy application,
    // early merge interactions) must agree between the collected
    // driver loop and the per-round cluster jobs
    val docs = Seq(
      (1L, "low lower lowest newest widest aaa aaaa"),
      (2L, "the quick brown fox jumps over the lazy dog the end"),
      (3L, "banana bandana ana ana nab ban"),
      (4L, "mississippi mississippi missive"))
      .toDF("doc_id", "text")
    def run(limit: Long) = Bpe.train(docs, "text", numMerges = 12,
        localVocabLimit = limit)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList
    val local = run(2000000L)
    val dist = run(0L) // forces the distributed loop
    assert(local == dist, s"local $local\nvs distributed $dist")
    assert(local.length == 12)
  }

  test("train stops early when no pair clears minPairCount") {
    import spark.implicits._
    val df = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // only pairs (a,b) and (c,d), count 1 each
    val m = Bpe.train(df, "text", numMerges = 5, minPairCount = 2L)
    assert(m.count() == 0L)
    val m2 = Bpe.train(df, "text", numMerges = 5)
    assert(m2.count() == 2L) // both singleton pairs merge, then dry
  }
}
