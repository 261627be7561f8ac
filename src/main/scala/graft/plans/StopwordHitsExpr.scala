package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword hit counts in ONE compiled pass: tokenize
  * (`trim` + `\s+`, the [[graft.functions.TextFunctions.tokens]]
  * convention) and count occurrences of each language's stopword list,
  * returning `array<bigint>` in [[graft.functions.TextFunctions
  * .stopwordLangs]] order.
  *
  * Replaces the HOF form (`size(filter(tokens, tok === w1 || ...))`
  * once per language) on the hot text path: higher-order-function
  * lambdas evaluate INTERPRETED per element — 4 languages x 10
  * comparisons per token, re-splitting the document per language —
  * while this kernel splits once and does one hash probe per
  * (token, language). Equality with the HOF form is asserted in
  * TextHygieneSpec; the language-ID/quality queries it feeds are
  * additionally hash-gated against DuckDB.
  */
case class StopwordHitsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_hits expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val sets = StopwordHitsExpr.sets
    val counts = new Array[Long](sets.length)
    val s = text.toString.trim
    if (s.nonEmpty) {
      val toks = s.split("\\s+")
      var i = 0
      while (i < toks.length) {
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(toks(i))) counts(k) += 1
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordHitsExpr", this,
      classOf[StopwordHitsExpr].getName)
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

  override def prettyName: String = "stopword_hits"
}

object StopwordHitsExpr {
  /** Language order and word sets, frozen from
    * [[graft.functions.TextFunctions.stopwords]] at class-load. */
  private[plans] lazy val sets: Array[java.util.HashSet[String]] =
    graft.functions.TextFunctions.stopwordLangs.map { l =>
      val s = new java.util.HashSet[String]()
      graft.functions.TextFunctions.stopwords(l).foreach(s.add)
      s
    }.toArray

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "stopword_hits",
      exprs => StopwordHitsExpr(exprs(0)),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def stopwordHits(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("stopword_hits", text)
  }
}
