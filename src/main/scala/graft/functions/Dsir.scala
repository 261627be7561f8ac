package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shaped data selection — score raw-pool documents by how
  * target-like their HASHED n-gram feature counts are, then take a
  * selection quota by score (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling": hashed unigram+bigram
  * features, importance weights from a target-vs-raw distribution
  * contrast, resample the raw pool by weight). The reference pipeline
  * has no data-selection stage; this is part of the LLM-pipeline
  * extension suite alongside the CCNet-style trained classifier
  * ([[TextFunctions.contrastModelTrain]]) — that one needs LABELS,
  * this one needs only an example corpus of what good data looks
  * like, which is how pretraining selection is actually specced
  * ("more like Wikipedia", not "here are 10M labeled docs").
  *
  * Importance weights use the engine's integer contrast surrogate
  * instead of DSIR's float log-likelihood ratio: a bucket's weight is
  * its target ppm minus its raw ppm (`cnt * 1000000 div mass`,
  * integral division — no float/log/ulp drift, hash-exact across
  * engines; monotone-aligned with the log-ratio sign bucket by
  * bucket). Feature HASHING is what makes the operator bounded by
  * construction: the weight table is exactly `buckets` rows no matter
  * how web-scale the raw pool's tail vocabulary is, so it broadcasts
  * at any corpus size — the same reason DSIR itself hashes.
  *
  * Scale shape: one gram pass over each corpus for the two bucket
  * distributions (map-side-combined count at bucket grain, output
  * `buckets` rows), one gram pass over the raw pool at (doc, bucket)
  * grain, a BROADCAST join against the weight table, and a per-doc
  * aggregate. Selection is `orderBy.limit` = TakeOrderedAndProject
  * (per-partition top-n, then merge) — never a global sort.
  */
object Dsir {

  /** Portable hashed feature bucket: fold the first 8 hex chars of
    * `md5(gram)` into a BIGINT, mod `buckets`. md5 is the engine's
    * portable hash (identical bytes in any engine, unlike engine-
    * native `hash()`/`xxhash64`); 8 hex chars < 2^32 so the fold
    * never overflows and is non-negative. */
  def featureBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** DSIR's feature set: unigrams + bigrams of the whitespace
    * tokens. Bigrams come from the NATIVE shingle kernel
    * ([[graft.plans.WordShinglesExpr]], `distinct = false` — byte-
    * identical output to the HOF [[TextFunctions.wordShingles]] by
    * the kernel's parity contract): the HOF's interpreted lambda
    * re-evaluates the token split per `element_at`, an O(tokens²)
    * regex pass per document that dominated the whole operator
    * (~30x on the sf0.1 gram pass). */
  private def grams(spark: org.apache.spark.sql.SparkSession,
      text: Column): Column =
    concat(TextFunctions.tokens(text),
      graft.plans.WordShinglesExpr.wordShingles(spark, text, 2,
        distinct = false))

  /** Per-corpus hashed-feature distribution: (bucket, cnt) over ALL
    * gram occurrences — `buckets` rows out, map-side combined. */
  def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    df.select(explode(grams(df.sparkSession, col(textCol))).as("gram"))
      .select(featureBucket(col("gram"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Importance-weight table: (bucket, weight) with
    * `weight = target_ppm - raw_ppm` in integer ppm of each corpus's
    * total gram mass. Exactly `buckets` rows (absent buckets count 0),
    * broadcastable by construction. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String, buckets: Int = 4096): DataFrame = {
    val ss = raw.sparkSession
    import ss.implicits._
    val tc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "tc")
    val rc = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "rc")
    // dense bucket spine: a bucket present in one corpus and absent in
    // the other still carries weight (the absent side reads 0 ppm)
    val spine = ss.range(buckets).select($"id".as("bucket"))
    val joined = spine
      .join(tc, Seq("bucket"), "left").join(rc, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    // masses as a 1-row broadcast (scalar-sized by contract)
    val mass = joined.agg(
      greatest(sum("tc"), lit(1L)).as("__tm"),
      greatest(sum("rc"), lit(1L)).as("__rm"))
    joined.crossJoin(broadcast(mass))
      .select(col("bucket"), col("tc"), col("rc"),
        (expr("tc * 1000000 div __tm") -
          expr("rc * 1000000 div __rm")).as("weight"))
  }

  /** Full pipeline: importance weights from (raw, target), then
    * per-doc scores: `score = Σ count(bucket) · weight(bucket)`;
    * `n_grams` gives the caller a length-normalized margin if wanted.
    * Gram-less docs score 0. One call owns the bucket modulus end to
    * end. Output (idCol, n_grams, score). */
  def scores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    val w = importanceWeights(raw, target, textCol, buckets)
    val occ = raw
      .select(col(idCol),
        explode(grams(raw.sparkSession, col(textCol))).as("gram"))
      .select(col(idCol), featureBucket(col("gram"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("k"))
    val perDoc = occ
      .join(broadcast(w.select("bucket", "weight")), Seq("bucket"))
      .groupBy(idCol).agg(sum("k").as("n_grams"),
        sum(col("k") * col("weight")).as("score"))
    raw.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Deterministic selection quota over a [[scores]] table: the `n`
    * most target-like raw docs by (score DESC, id ASC) — the
    * greedy-top-k variant of DSIR's resampling (the paper's Gumbel
    * noise exists to de-bias repeated draws; a single selection pass
    * wants the argmax set). `TakeOrderedAndProject`, never a global
    * sort. */
  def selectTop(scored: DataFrame, idCol: String, n: Int): DataFrame =
    scored.orderBy(col("score").desc, col(idCol)).limit(n)

  /** End-to-end selection: score `raw` against `target`'s hashed-gram
    * distribution and keep the top `n`. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int, buckets: Int = 4096): DataFrame =
    selectTop(scores(raw, target, idCol, textCol, buckets), idCol, n)
}
