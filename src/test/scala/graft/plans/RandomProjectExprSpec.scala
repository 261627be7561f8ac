package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.similarity.Similarity

/** The broadcast-matrix expression must be BIT-identical to the
  * literal-HOF path — same seed-derived signs, same IEEE fold order —
  * including the HOF's null semantics. */
class RandomProjectExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(dIn: Int) = {
    import spark.implicits._
    def v(row: Int): Array[java.lang.Float] =
      Array.tabulate[java.lang.Float](dIn)(i =>
        (math.sin(row * 31 + i) * (if ((row + i) % 3 == 0) -7.25f else 3.5f))
          .toFloat)
    val withNullElem = v(3); withNullElem(dIn / 2) = null
    Seq(
      (1L, v(1)), (2L, v(2)), (3L, withNullElem),
      (4L, null.asInstanceOf[Array[java.lang.Float]]),
      (5L, Array.fill[java.lang.Float](dIn)(0.0f)))
      .toDF("vec_id", "embedding")
  }

  private def collectProj(threshold: Int, dIn: Int, dOut: Int) =
    Similarity.randomProjection(vecs(dIn), "embedding", dIn, dOut,
        seed = 42L, broadcastCoeffThreshold = threshold)
      .orderBy("vec_id").select("projected")
      .collect().map { r =>
        if (r.isNullAt(0)) null
        else r.getSeq[Any](0).map(x => Option(x)).toList
      }.toList

  test("expression path == literal-HOF path bit-for-bit, including " +
      "null vector -> dOut nulls and null element poisoning") {
    val dIn = 48; val dOut = 6
    val hof = collectProj(threshold = Int.MaxValue, dIn, dOut)
    val expr = collectProj(threshold = 0, dIn, dOut)
    assert(hof == expr, s"hof=$hof\nexpr=$expr")
    // the null-semantics pins (both paths)
    assert(expr(3) == List.fill(dOut)(None), "null vec must give dOut nulls")
    assert(expr(2) == List.fill(dOut)(None), "null element must poison outputs")
    assert(expr(4).forall(_.contains(0.0)), "zero vec projects to zeros")
  }

  test("large-matrix path keeps the PLAN small: no literal of " +
      "dIn*dOut doubles in the plan text") {
    val dIn = 512; val dOut = 32 // 16k coefficients
    val big = Similarity.randomProjection(vecs(dIn), "embedding",
      dIn, dOut, seed = 7L, broadcastCoeffThreshold = 0)
    val lit = Similarity.randomProjection(vecs(dIn), "embedding",
      dIn, dOut, seed = 7L, broadcastCoeffThreshold = Int.MaxValue)
    val bigPlan = big.queryExecution.analyzed.toString
    val litPlan = lit.queryExecution.analyzed.toString
    assert(bigPlan.length < litPlan.length / 4,
      s"expr plan ${bigPlan.length} chars vs literal ${litPlan.length}")
    // and the two still agree numerically at this size
    val a = big.orderBy("vec_id").select("projected").collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Any](0).toList).toList
    val b = lit.orderBy("vec_id").select("projected").collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Any](0).toList).toList
    assert(a == b)
  }
}
