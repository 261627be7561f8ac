package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PER-ROW MinHash signature: tokenize, form word n-gram shingles, and
  * take the per-seed minimum of `xxhash64(shingle, seed)` — the whole
  * signature in ONE compiled kernel call per document, no explode, no
  * aggregate, no shuffle.
  *
  * Bit-for-bit equal to the batch explode+agg path
  * ([[graft.dedup.Dedup.minHashSignaturesFromShingles]]): the hash
  * stream is the same `XxHash64Function` fold Spark's `xxhash64(col,
  * lit(seed))` performs (seed 42 -> fold the shingle string -> fold the
  * int seed), the tokenizer is the same `trim + \s+` split, and shingle
  * duplicates can't change a minimum. MinHashSigExprSpec asserts the
  * equality on the fixture corpus.
  *
  * This is the STREAMING-SHAPE primitive: the batch path's
  * explode+groupBy would be a stateful aggregation inside a stream,
  * while a per-row expression keeps signature computation stateless —
  * state is then spent only where it pays (the LSH band buckets,
  * [[graft.streaming.PipelineStreams.lshCandidates]]). Docs with fewer
  * than `n` tokens yield an EMPTY array (they have no shingles, so the
  * batch path gives them no signature row either — filter on
  * `size(sig) > 0` for the same population).
  */
case class MinHashSigExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1 && numHashes >= 1, "n and numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects a string column, got $other")
  }

  /** Per-row kernel; called from both eval and the generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Long])
    val toks = s.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      // xxhash64(shingle, lit(seed)) == fold: 42 -> string -> int seed
      val base = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      var k = 0
      while (k < numHashes) {
        val h = XxHash64Function.hash(Integer.valueOf(k), IntegerType, base)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigExpr", this,
      classOf[MinHashSigExpr].getName)
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

  override def prettyName: String = "minhash_signature"
}

object MinHashSigExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSigExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Column-level entry point (register + call_function — the Spark 4
    * bridge, see [[HistogramQuantileExpr]]). */
  def minHashSignature(spark: SparkSession, text: Column, n: Int,
      numHashes: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_signature",
      text, org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
