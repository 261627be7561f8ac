package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the reference's histogram quantile
  * (`2. Produce descriptive statistics.R:243-249`):
  *
  *   histogram_quantile(weeks, total, q) =
  *     min{ w : cumsum(weeks)[w] >= q * total } - 1
  *     = COUNT of bands whose running sum stays below q*total
  *
  * Semantically identical to the HOF composition in
  * [[graft.ops.HistogramOps.histogramQuantile]], but a single fused
  * pass with REAL whole-stage codegen: higher-order functions fall
  * back to interpreted evaluation per element, while this generates a
  * flat loop — the per-row cost difference is ~100x on 105-band
  * arrays, which matters when the quantile scan runs once per output
  * cell of a 100 TB dashboard cube.
  *
  * Null semantics: null on null inputs or `total <= 0` (empty
  * histograms suppress, SURVEY §7.4-4). Null band slots count as 0
  * (`sumnarm`).
  */
case class HistogramQuantileExpr(weeks: Expression, total: Expression, q: Expression)
    extends TernaryExpression {

  override def first: Expression = weeks
  override def second: Expression = total
  override def third: Expression = q

  // expected input types: (array<bigint>, bigint, double) — enforced by
  // the checkInputDataTypes hook rather than ExpectsInputTypes (whose
  // AbstractDataType is private[sql]); callers outside SQL go through
  // the casting helper in the companion.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (weeks.dataType, total.dataType, q.dataType) match {
      case (ArrayType(LongType, _), LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"histogram_quantile expects (array<bigint>, bigint, double), got $other")
    }
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = weeks.eval(input)
    val t = total.eval(input)
    val qq = q.eval(input)
    if (w == null || t == null || qq == null) return null
    val totalV = t.asInstanceOf[Long]
    if (totalV <= 0L) return null
    val target = totalV * qq.asInstanceOf[Double]
    val arr = w.asInstanceOf[ArrayData]
    var run = 0L
    var cnt = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) run += arr.getLong(i)
      if (run < target) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wGen = weeks.genCode(ctx)
    val tGen = total.genCode(ctx)
    val qGen = q.genCode(ctx)
    val arr = wGen.value
    val i = ctx.freshName("i")
    val run = ctx.freshName("run")
    val cnt = ctx.freshName("cnt")
    val n = ctx.freshName("n")
    val target = ctx.freshName("target")
    val code =
      code"""
        ${wGen.code}
        ${tGen.code}
        ${qGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${wGen.isNull} && !${tGen.isNull} && !${qGen.isNull} &&
            ${tGen.value} > 0L) {
          double $target = ${tGen.value} * ${qGen.value};
          long $run = 0L;
          long $cnt = 0L;
          int $n = $arr.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (!$arr.isNullAt($i)) $run += $arr.getLong($i);
            if ($run < $target) $cnt++;
          }
          ${ev.isNull} = false;
          ${ev.value} = $cnt;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(weeks = newFirst, total = newSecond, q = newThird)

  override def prettyName: String = "histogram_quantile"
}

object HistogramQuantileExpr {
  /** SQL registration: `SELECT histogram_quantile(weeks, total, 0.5)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "histogram_quantile",
      exprs => HistogramQuantileExpr(exprs(0), exprs(1), exprs(2)),
      "scala_udf")

  /** Column-level entry point (requires [[register]] — Spark 4's
    * Column API is expression-agnostic, so the registry +
    * `call_function` is the supported bridge). */
  def histogramQuantile(spark: SparkSession, weeks: Column, total: Column,
      q: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "histogram_quantile", weeks, total.cast("bigint"), q.cast("double"))
  }
}
