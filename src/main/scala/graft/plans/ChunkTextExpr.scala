package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Context-window CHUNKING: split a document into pieces of at most
  * `maxChars` characters, greedily breaking after the LAST whitespace
  * inside each window (a hard cut only when a window holds no
  * whitespace at all — one unbroken `maxChars`-char token). This is
  * the pre-tokenization step of a training pipeline: long documents
  * must become model-context-sized pieces WITHOUT splitting words,
  * and the split must be reconstructible.
  *
  * Contract (all three are asserted by ChunkTextExprSpec and proven
  * per-row through the q_chunk_docs gate):
  *   1. `concat(chunks) == text` byte-exact — the break character
  *      stays at the END of its chunk, nothing is dropped;
  *   2. every chunk has `1 <= length <= maxChars`;
  *   3. every chunk except the last ends with whitespace or is
  *      exactly `maxChars` long (the no-whitespace hard cut).
  *
  * Whitespace is exactly `' '`, `'\t'`, `'\n'`, `'\r'` — pinned (not
  * `Character.isWhitespace`) so the DuckDB oracle's `[ \t\n\r]`
  * character class is the identical predicate.
  *
  * One forward pass per row inside whole-stage codegen; the per-row
  * cost is O(len) amortized (each window scans back at most
  * `maxChars` chars and then advances past them). No UDF, no shuffle:
  * chunking is embarrassingly parallel and the array explodes
  * downstream into (doc, ord, chunk) rows.
  */
case class ChunkTextExpr(child: Expression, maxChars: Int)
    extends UnaryExpression {

  require(maxChars >= 1, "maxChars must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_text expects a string column, got $other")
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](len / maxChars + 1)
    var pos = 0
    while (pos < len) {
      val rem = len - pos
      val cLen =
        if (rem <= maxChars) rem
        else {
          // last whitespace inside [pos, pos + maxChars)
          var i = maxChars - 1
          while (i >= 0 && !isWs(s.charAt(pos + i))) i -= 1
          if (i >= 0) i + 1 else maxChars
        }
      out += UTF8String.fromString(s.substring(pos, pos + cLen))
      pos += cLen
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkExpr", this,
      classOf[ChunkTextExpr].getName)
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

  override def prettyName: String = "chunk_text"
}

object ChunkTextExpr {
  /** SQL registration: `SELECT chunk_text(text, 512)` — maxChars must
    * be a foldable int literal (validated like the other graft
    * extensions, see GraftExtensions.intLit). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_text",
      exprs => ChunkTextExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def chunkText(spark: SparkSession, text: Column, maxChars: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("chunk_text",
      text, org.apache.spark.sql.functions.lit(maxChars))
  }
}
