package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PortableHash64ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Straight-line reimplementation driven by the Seeds/Mults arrays —
    * guards the hand-unrolled kernel against constant drift (the DuckDB
    * oracle SQL is generated from the same arrays). */
  private def reference(s: String): Long = {
    val hs = PortableHash64Expr.Seeds.clone()
    s.foreach { c =>
      var k = 0
      while (k < 4) {
        hs(k) = (hs(k) * PortableHash64Expr.Mults(k) + c.toLong) & 0xFFFFFFFFL
        k += 1
      }
    }
    (0 until 4).map(k => (hs(k) & 0xFFFFL) << (16 * k)).reduce(_ | _)
  }

  test("kernel matches the array-driven reference fold") {
    val samples = Seq("", "a", "ab", "the", "quick", "hello world",
      "x" * 300, "1234567890", "punct!?;:", "Grüße") // BMP non-ASCII too
    val expr = PortableHash64Expr(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    samples.foreach { s =>
      assert(expr.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        == reference(s), s"mismatch for '$s'")
    }
  }

  test("codegen path (DataFrame select) equals the kernel; null stays null") {
    import spark.implicits._
    val df = Seq(Some("alpha beta"), Some(""), Some("tok"), None)
      .toDF("t")
      .select(col("t"), PortableHash64Expr.portableHash64(spark, col("t")).as("h"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(null).isEmpty)
    Seq("alpha beta", "", "tok").foreach { s =>
      assert(got(s).contains(reference(s)), s"codegen mismatch for '$s'")
    }
  }

  test("four 16-bit lanes are decorrelated even on single-char tokens") {
    // with a shared seed all four folds of a 1-char token collapse;
    // the distinct seeds must keep the lanes apart
    val h = reference("a")
    val lanes = (0 until 4).map(k => (h >> (16 * k)) & 0xFFFFL)
    assert(lanes.distinct.size == 4, s"lanes collapsed: $lanes")
  }

  test("portable simhash: expression form equals scalable explode+agg form") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox the fox"), (2L, "a b c d"),
      (3L, "lorem ipsum dolor sit amet"), (4L, ""))
      .toDF("doc_id", "text")
    val ph = (t: org.apache.spark.sql.Column) =>
      PortableHash64Expr.portableHash64(spark, t)
    val viaExpr = df.select(col("doc_id"),
        graft.dedup.Dedup.simHash64(col("text"), ph).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = graft.dedup.Dedup.simHashSignatures(df, "doc_id", "text", ph)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
  }
}
