package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // corpus: A = "a b a b", B = "a b c", C = "x" (no bigrams)
  // bigram counts: "a b"=3, "b a"=1, "b c"=1
  // prefix counts: a=3, b=2
  // ppm: s(a b) = 3*1e6 div 3 = 1000000; s(b a) = s(b c) = 500000
  private def docs = {
    import spark.implicits._
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
  }

  test("self-corpus scores match hand-computed integer ppm") {
    val out = TextFunctions.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("score_sum"),
          Option(r.getAs[java.lang.Long]("fam_ppm")).map(_.longValue))))
      .toMap
    // A: 2 * s(a b) + s(b a) = 2500000 over 3 bigrams -> fam 833333
    assert(out(1L) == ((3L, 2500000L, Some(833333L))))
    // B: s(a b) + s(b c) = 1500000 over 2 -> fam 750000
    assert(out(2L) == ((2L, 1500000L, Some(750000L))))
    // C: no bigrams -> zero sums, null mean
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("external LM corpus: unseen transitions score 0 but still count") {
    import spark.implicits._
    // LM trained on B only: counts "a b"=1, "b c"=1; cp(a)=cp(b)=1
    val lm = Seq((9L, "a b c")).toDF("doc_id", "text")
    val out = TextFunctions.bigramLmScores(docs, "doc_id", "text", Some(lm))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("score_sum"),
          Option(r.getAs[java.lang.Long]("fam_ppm")).map(_.longValue))))
      .toMap
    // A: "a b" x2 at 1e6 each, "b a" unseen -> 0; fam = 2e6 div 3
    assert(out(1L) == ((3L, 2000000L, Some(666666L))))
    assert(out(2L) == ((2L, 2000000L, Some(1000000L))))
  }
}
