package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent word n-gram WITHIN one document — the
  * top-n-gram numerator of the Gopher repetition gates (Rae et al.
  * 2021, public paper), as a single native kernel pass.
  *
  * The quantity is a pure function of the row: which n-gram repeats
  * most inside THIS document. Computing it relationally — explode
  * every gram, shuffle (doc, gram), count, re-aggregate max, join back
  * to the doc grain — moves the entire gram stream through an exchange
  * twice per n, for an answer that never needed to leave the row. At a
  * 100 TB corpus that was the dominant cost of the repetition gate;
  * here it is a per-row hash-count loop inside whole-stage codegen,
  * and the gate ([[graft.functions.TextFunctions.repetitionStats]])
  * becomes a zero-shuffle map.
  *
  * Returns 0 for documents with no n-grams (fewer than n tokens), the
  * same value the relational shape's left-join + coalesce produced.
  * Tokenization parity with `TextFunctions.tokens` via
  * [[WordShinglesExpr.tokenize]].
  */
case class TopGramCountExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_gram_count expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): Long = {
    val toks = WordShinglesExpr.tokenize(text)
    val nGrams = toks.length - n + 1
    if (nGrams < 1) return 0L
    val counts = new java.util.HashMap[String, Int](nGrams * 2)
    val sb = new java.lang.StringBuilder
    var max = 0
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    max.toLong
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topGramExpr", this,
      classOf[TopGramCountExpr].getName)
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

  override def prettyName: String = "top_gram_count"
}

object TopGramCountExpr {
  /** SQL registration: `SELECT top_gram_count(text, 2)` — n must be a
    * foldable int literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_gram_count",
      exprs => TopGramCountExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def topGramCount(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("top_gram_count",
      text, org.apache.spark.sql.functions.lit(n))
  }
}
