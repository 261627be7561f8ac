package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NormalizeTextExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("NFC composes combining marks; ASCII passes through zero-copy") {
    import spark.implicits._
    val rows = Seq(
      Some("cafe\u0301"),   // decomposed -> caf\u00e9
      Some("A\u0308b"),     // decomposed -> \u00c4b
      Some("caf\u00e9"),    // already NFC
      Some("plain ascii"),
      Some(""),
      None)
    val got = rows.toDF("t")
      .select(col("t"), NormalizeTextExpr.normalizeText(spark, col("t")).as("n"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got("cafe\u0301") == "caf\u00e9")
    assert(got("A\u0308b") == "\u00c4b")
    assert(got("caf\u00e9") == "caf\u00e9")
    assert(got("plain ascii") == "plain ascii")
    assert(got("") == "")
    assert(got(null) == null)
  }

  test("NFKC folds compatibility forms NFC must preserve") {
    import spark.implicits._
    // U+FB01 LATIN SMALL LIGATURE FI, U+FF21 FULLWIDTH A
    val df = Seq("\ufb01n", "\uff21B").toDF("t")
      .select(col("t"),
        NormalizeTextExpr.normalizeText(spark, col("t"), "NFC").as("nfc"),
        NormalizeTextExpr.normalizeText(spark, col("t"), "NFKC").as("nfkc"))
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getString(2)))).toMap
    assert(got("\ufb01n") == (("\ufb01n", "fin")))
    assert(got("\uff21B") == (("\uff21B", "AB")))
  }

  test("unknown form and non-string input fail analysis") {
    val e = NormalizeTextExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    assert(e.checkInputDataTypes().isFailure)
    val e2 = NormalizeTextExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(1), "NFC")
    assert(e2.checkInputDataTypes().isFailure)
  }

  test("expression stays inside whole-stage codegen") {
    // non-foldable input (range + concat) so the projection survives
    // constant folding and must actually compile
    val plan = spark.range(3)
      .select(NormalizeTextExpr.normalizeText(spark,
        concat(col("id").cast("string"), lit("e\u0301"))).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
