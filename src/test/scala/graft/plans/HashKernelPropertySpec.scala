package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks for the compiled hash kernels, sampled with a
  * fixed-seed RNG (scalacheck's test runner isn't on the offline
  * classpath — manual sampling keeps determinism anyway). */
class HashKernelPropertySpec extends AnyFunSuite {

  private def randomTokens(rng: scala.util.Random, n: Int): String =
    Seq.fill(n)(rng.alphanumeric.take(1 + rng.nextInt(8)).mkString).mkString(" ")

  test("portable_hash64: every signature bit is unbiased over random tokens") {
    val rng = new scala.util.Random(42)
    val expr = PortableHash64Expr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val n = 4000
    val counts = new Array[Int](64)
    (0 until n).foreach { _ =>
      val h = expr.compute(org.apache.spark.unsafe.types.UTF8String
        .fromString(rng.alphanumeric.take(3 + rng.nextInt(12)).mkString))
      (0 until 64).foreach(b => if (((h >> b) & 1L) == 1L) counts(b) += 1)
    }
    // SimHash needs each projection bit to be ~fair: a stuck or heavily
    // biased bit silently degrades every downstream Hamming distance
    counts.zipWithIndex.foreach { case (c, b) =>
      assert(c > n * 0.42 && c < n * 0.58,
        s"bit $b set in $c/$n samples — biased lane")
    }
  }

  test("minhash_signature kernel == HOF minHashSignature on random documents") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = (0 until 40).map(i => (i.toLong, randomTokens(rng, 2 + rng.nextInt(30))))
    val df = docs.toDF("doc_id", "text")
    val viaKernel = df.select(col("doc_id"),
        MinHashSigExpr.minHashSignature(spark, col("text"), 3, 32).as("sig"))
      .filter(size(col("sig")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaHof = df
      .withColumn("sh", graft.functions.TextFunctions.wordShingles(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.dedup.Dedup.minHashSignature(col("sh"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaKernel.keySet == viaHof.keySet)
    assert(viaKernel.nonEmpty)
    viaHof.foreach { case (id, sig) =>
      assert(viaKernel(id) == sig, s"kernel/HOF mismatch for doc $id")
    }
  }
}
