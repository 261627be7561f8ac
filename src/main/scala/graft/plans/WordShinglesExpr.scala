package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word n-gram shingles as ONE native kernel pass — the
  * zero-shuffle replacement for both shingle-generation shapes:
  *
  *  - [[graft.dedup.Dedup.shingles]]'s posexplode + lead-window +
  *    distinct needed an Exchange+Sort on the EXPLODED token stream
  *    (one row per token through the shuffle) plus a second exchange
  *    for the distinct — at corpus scale, two full shuffles of the
  *    token volume before the first real dedup operator ran. With
  *    `distinct = true` the per-document shingle SET falls out of the
  *    row itself; explode downstream and the (id, shingle) relation is
  *    identical, no exchange anywhere.
  *  - [[graft.functions.TextFunctions.wordShingles]]'s HOF
  *    (`transform` + `element_at` + `concat_ws`) kept the plan
  *    shuffle-free but evaluates an interpreted lambda per position.
  *    `distinct = false` reproduces its output exactly (order kept,
  *    duplicates kept — repetition gates COUNT the duplicates) in a
  *    compiled loop.
  *
  * Tokenization parity is the load-bearing detail: this kernel must
  * split exactly like `TextFunctions.tokens` = `split(trim(text),
  * "\\s+")`, whose `trim` strips SPACES only — text leading with a tab
  * or newline yields an empty first token, and the established DuckDB
  * oracles reproduce that quirk. The kernel therefore trims the space
  * character only and uses Java `String.split("\\s+")` (the same regex
  * engine Spark's `split` uses), not `String.trim`/`strip`.
  */
case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val toks = WordShinglesExpr.tokenize(text)
    val nGrams = toks.length - n + 1
    if (nGrams < 1) return WordShinglesExpr.Empty
    val sb = new java.lang.StringBuilder
    if (distinct) {
      // LinkedHashSet: first-occurrence order, so output is a pure
      // function of the text (deterministic across partitionings)
      val seen = new java.util.LinkedHashSet[UTF8String](nGrams * 2)
      var i = 0
      while (i < nGrams) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
      new GenericArrayData(
        seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](nGrams)
      var i = 0
      while (i < nGrams) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this,
      classOf[WordShinglesExpr].getName)
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

  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  private[plans] val Empty = new GenericArrayData(Array.empty[Any])

  /** `TextFunctions.tokens` parity split: space-only trim (Spark
    * `trim` strips ' ' only — String.trim would also strip
    * tabs/newlines and change the token split), then
    * `split("\\s+", -1)` — Spark's 2-arg `split` uses limit -1, which
    * KEEPS trailing empty tokens ("a\t" -> ["a", ""]), unlike Java's
    * default limit 0. Returns empty for all-space/empty input, like
    * `tokens`. */
  private[plans] def tokenize(text: UTF8String): Array[String] = {
    val raw = text.toString
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    if (hi == lo) Array.empty[String]
    else raw.substring(lo, hi).split("\\s+", -1)
  }

  /** SQL registration: `SELECT word_shingles(text, 3, 1)` — n and the
    * distinct flag (0/1) must be foldable int literals. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShinglesExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int] != 0),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def wordShingles(spark: SparkSession, text: Column, n: Int,
      distinct: Boolean): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("word_shingles",
      text, org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(if (distinct) 1 else 0))
  }
}
