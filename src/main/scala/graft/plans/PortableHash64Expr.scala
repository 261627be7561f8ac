package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ENGINE-PORTABLE 64-bit string hash: four independent polynomial
  * folds over the characters — `h_k = (h_k * m_k + c) mod 2^32`, seeded
  * distinctly per fold — with the low 16 bits of each fold packed into
  * one long (fold 0 -> bits 0-15, fold 1 -> bits 16-31, ...). Every
  * intermediate stays under 2^38, so the SAME recurrence evaluates
  * exactly in any engine with plain 64-bit integer SQL (the DuckDB gate
  * restates it as four `list_reduce` folds) — unlike `xxhash64`, whose
  * avalanche mixing exists only inside Spark.
  *
  * Purpose-built as the SimHash projection family ([[graft.dedup.Dedup
  * .simHashSignatures]]): SimHash needs 64 *independent, unbiased* bits
  * per token, not avalanche quality — distinct multipliers/seeds keep
  * the four 16-bit lanes uncorrelated, which is all the
  * majority-vote uses. Not for hash tables or partitioning keys (low
  * bits of polynomial hashes correlate under common suffixes); there
  * `xxhash64` stays the right tool.
  *
  * Hashing is over UTF-16 code units == code points for ASCII/BMP text
  * (same convention as [[WinnowFingerprintsExpr]]); shard non-BMP
  * corpora by bytes upstream if exact cross-engine parity matters.
  *
  * Codegen: stays inside whole-stage codegen — one compiled-kernel call
  * per row, no CodegenFallback barrier, no per-element interpretation.
  */
case class PortableHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_hash64 expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var h0 = PortableHash64Expr.Seeds(0)
    var h1 = PortableHash64Expr.Seeds(1)
    var h2 = PortableHash64Expr.Seeds(2)
    var h3 = PortableHash64Expr.Seeds(3)
    var i = 0
    while (i < n) {
      val c = s.charAt(i).toLong
      h0 = (h0 * 31 + c) & PortableHash64Expr.Mask
      h1 = (h1 * 37 + c) & PortableHash64Expr.Mask
      h2 = (h2 * 41 + c) & PortableHash64Expr.Mask
      h3 = (h3 * 43 + c) & PortableHash64Expr.Mask
      i += 1
    }
    (h0 & 0xFFFFL) | ((h1 & 0xFFFFL) << 16) |
      ((h2 & 0xFFFFL) << 32) | ((h3 & 0xFFFFL) << 48)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("portableHashExpr", this,
      classOf[PortableHash64Expr].getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.compute(${c.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "portable_hash64"
}

object PortableHash64Expr {
  private[plans] val Mask = 0xFFFFFFFFL // mod 2^32

  /** Fold seeds — distinct so single-character tokens still get four
    * uncorrelated lanes (with a shared seed all four folds of a
    * 1-char token would collapse to the same value). */
  val Seeds: Array[Long] = Array(17L, 101L, 257L, 509L)

  /** Fold multipliers, matching [[Seeds]] by index. */
  val Mults: Array[Long] = Array(31L, 37L, 41L, 43L)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash64",
      exprs => PortableHash64Expr(exprs(0)),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def portableHash64(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("portable_hash64", text)
  }
}
