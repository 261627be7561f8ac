package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Gopher-style repetition signals (TextFunctions.repetitionStats):
  * hand-computed n-gram counts and integer-math gate decisions. */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def statsFor(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextFunctions.repetitionStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
  }

  test("hand-computed counts and gate on known docs") {
    val got = statsFor(Seq(
      // 8 toks, all distinct; top 3-gram 1/6 <= 0.18 -> all gates pass
      // (note a fully-distinct 6-token doc still FAILS: 1/4 > 0.18)
      (1L, "a b c d e f g h"),
      // "x x x x": 4 toks, 1 distinct -> dup frac 3/4 > 0.3 fail;
      // top 2-gram "x x" = 3/3 > 0.2 fail; top 3-gram 2/2 > 0.18 fail
      (2L, "x x x x"),
      // empty doc fails the gate with zero counts
      (3L, "   "),
      // "a b a b a": top 2-gram "a b" 2 of 4 (0.5 > 0.2) -> fail even
      // though dup-token frac 3/5 fails too; counts checked exactly
      (4L, "a b a b a")))
    assert(got(1L) == ((8L, 8L, 7L, 6L, 1L, 1L, 1L)))
    assert(got(2L) == ((4L, 1L, 3L, 2L, 3L, 2L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((5L, 2L, 4L, 3L, 2L, 2L, 0L)))
  }

  test("gate boundaries are exact rationals, not float comparisons") {
    // 10 toks, 7 distinct -> dup frac exactly 0.3: (10-7)*10 <= 10*3 passes
    val got = statsFor(Seq((1L, "a b c d e f g a b c")))
    val (nT, nD, _, _, top2, _, ok) = got(1L)
    assert(nT == 10L && nD == 7L)
    // top 2-gram: "a b" and "b c" appear twice of 9 -> 2*5=10 > 9 fails 0.2
    assert(top2 == 2L && ok == 0L)
  }
}
