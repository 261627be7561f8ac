package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNICODE NORMALIZATION as a native codegen expression — the text-
  * hygiene primitive Spark's function library lacks (`lower`/`trim`
  * exist, canonical composition does not). Web-crawled corpora mix
  * precomposed and combining-mark encodings of the SAME text ("é" as
  * U+00E9 vs U+0065 U+0301); every downstream exact-dedup fingerprint,
  * shingle, vocab entry, and equality join silently treats them as
  * different documents until normalization runs. NFC is the standard
  * pre-fingerprint form (and the one DuckDB's `nfc_normalize` mirrors,
  * making it gate-checkable); NFKC additionally folds compatibility
  * forms (ligatures, full-width) for search-style matching.
  *
  * Kernel = `java.text.Normalizer` (the JDK's ICU-derived
  * implementation, Unicode-conformant) wrapped as a codegen'd
  * `UnaryExpression`: one virtual call per row inside whole-stage
  * codegen, no UDF serialization boundary, no CodegenFallback. The
  * common already-normalized case costs one `isNormalized` scan and
  * returns the INPUT UTF8String unchanged (zero-copy) — on mostly-
  * ASCII corpora the expression is effectively a pass-through check.
  */
case class NormalizeTextExpr(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm =
    java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeTextExpr.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unknown normalization form '$form' (expected one of " +
        s"${NormalizeTextExpr.Forms.mkString(", ")})")
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code.
    * ASCII fast path FIRST, on the raw UTF8 bytes: 7-bit text is
    * normalized under every Unicode form, and `isFullAscii` is one
    * vectorizable byte scan — without it every row pays a full
    * `toString` decode + allocation just to learn it was already
    * normalized (measured ~5 s of pure overhead per corpus pass at
    * sf0.1 on the all-ASCII fixture). Non-ASCII rows fall through to
    * the JDK check/normalize pair. */
  def compute(text: UTF8String): UTF8String = {
    if (text.isFullAscii) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, normForm)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, normForm))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeTextExpr", this,
      classOf[NormalizeTextExpr].getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.compute(${c.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text",
      exprs => {
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType)
              if v != null => // null guard: v.toString below would NPE
            v.toString
          case other => throw new IllegalArgumentException(
            s"normalize_text: form must be a non-null string literal, got $other")
        }
        NormalizeTextExpr(exprs(0), form)
      },
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def normalizeText(spark: SparkSession, text: Column,
      form: String = "NFC"): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("normalize_text", text,
      org.apache.spark.sql.functions.lit(form))
  }
}
