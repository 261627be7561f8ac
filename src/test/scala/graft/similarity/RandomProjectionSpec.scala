package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
  }

  private def proj(seed: Long) =
    Similarity.randomProjection(vecs, "embedding", dIn = 4, dOut = 2,
        seed = seed)
      .select(col("vec_id"), col("projected"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("unit vectors read the sign matrix off directly; projection is linear") {
    val p = proj(0L)
    assert(p(1L).length == 2)
    // e_i projects to (sign(i,0), sign(i,1)) — all entries ±1
    assert(p(1L).forall(v => v == 1.0 || v == -1.0))
    assert(p(2L).forall(v => v == 1.0 || v == -1.0))
    // linearity: proj(2·e_0) = 2·proj(e_0), exact in doubles
    assert(p(3L) == p(1L).map(_ * 2.0))
    // all-ones vector sums one full sign row per output dim: parity
    // of 4 ±1 terms is even
    assert(p(4L).forall(v => v % 2.0 == 0.0 && math.abs(v) <= 4.0))
  }

  test("seed-deterministic: same seed identical, different seed differs") {
    val a = proj(7L); val b = proj(7L); val c = proj(13L)
    assert(a == b)
    // 4 docs x 2 dims of ±1 folds — astronomically unlikely to
    // coincide across seeds unless the seed is ignored
    assert(a != c)
  }
}
