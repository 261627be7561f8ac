package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-POSITION k-gram rolling hashes: element `i` of the result is
  * the hash of `text[i, i+k)` — [[WinnowFingerprintsExpr]]'s sibling
  * that KEEPS positions instead of winnowing them away. The position
  * is the array index, so `posexplode` downstream yields `(pos, hash)`
  * pairs with no extra bookkeeping column.
  *
  * This is the candidate primitive for duplicated-SPAN detection (the
  * scalable core of suffix-array substring dedup, Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — public
  * paper): a position whose k-gram hash occurs in more than one
  * document lies inside a cross-document duplicated substring of
  * length >= k, and maximal duplicated spans fall out of a
  * gaps-and-islands merge over the flagged positions — windows + one
  * equi-join, never a suffix array on the driver.
  *
  * Same hash family as winnowing (base 31, mod 2^32, O(1) rolling
  * update, UTF-16 code units), so the DuckDB oracle restates it as the
  * from-scratch `list_reduce` fold already proven portable for
  * `q_t_winnow`.
  */
case class KgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes expects a string column, got $other")
  }

  private val Mask = 0xFFFFFFFFL // mod 2^32

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val nk = s.length - k + 1
    if (nk < 1) return new GenericArrayData(Array.empty[Long])
    var pow = 1L
    var j = 1
    while (j < k) { pow = (pow * 31) & Mask; j += 1 }
    val hashes = new Array[Long](nk)
    var h = 0L
    var i = 0
    while (i < k) { h = if (i == 0) s.charAt(0).toLong else (h * 31 + s.charAt(i)) & Mask; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nk) {
      h = (((h - (s.charAt(i - 1) * pow & Mask)) & Mask) * 31 + s.charAt(i + k - 1)) & Mask
      hashes(i) = h
      i += 1
    }
    new GenericArrayData(hashes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kgramExpr", this,
      classOf[KgramHashesExpr].getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.compute(${c.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "kgram_hashes"
}

object KgramHashesExpr {
  /** SQL registration: `SELECT kgram_hashes(text, 20)` — k must be a
    * foldable int literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kgram_hashes",
      exprs => KgramHashesExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def kgramHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kgram_hashes",
      text, org.apache.spark.sql.functions.lit(k))
  }
}
