package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans._

/** Library integration point — `SparkSessionExtensions` injector for
  * every native graft expression, so a cluster enables the whole
  * function family once at session build time:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * and then plain SQL sees them (`SELECT histogram_quantile(weeks,
  * total, 0.5) ...`) in EVERY session of that context — unlike the
  * per-session `register(spark)` helpers on each expression's
  * companion (which remain for tests/notebooks; both routes build the
  * identical expression tree, so plans and codegen are the same).
  *
  * Everything injected here is a full Catalyst expression with
  * `doGenCode` — inside whole-stage codegen, never a UDF boundary.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String,
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("histogram_quantile",
      "histogram_quantile(weeks, total, q) - banded-histogram quantile (A12)",
      es => HistogramQuantileExpr(es(0), es(1), es(2)))
    inject("band_sum",
      "band_sum(weeks, maxBands) - null-skipping elementwise band-vector sum (A2)",
      es => BandSumAgg(es(0), es(1)))
    inject("minhash_signature",
      "minhash_signature(text, n, numHashes) - per-row MinHash signature",
      es => MinHashSigExpr(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]))
    inject("kgram_hashes",
      "kgram_hashes(text, k) - rolling k-gram hash per character position",
      es => KgramHashesExpr(es(0), es(1).eval().asInstanceOf[Int]))
    inject("portable_hash64",
      "portable_hash64(s) - engine-portable 64-bit string hash",
      es => PortableHash64Expr(es(0)))
    inject("stopword_hits",
      "stopword_hits(text) - stopword occurrence count in one pass",
      es => StopwordHitsExpr(es(0)))
    inject("winnow_fingerprints",
      "winnow_fingerprints(text, k, w) - MOSS winnowing fingerprint set",
      es => WinnowFingerprintsExpr(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]))
  }
}
