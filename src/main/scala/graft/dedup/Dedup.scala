package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine. All are
  * DataFrame compositions designed around ONE principle: never compare
  * all pairs at scale — candidate generation must go through a
  * hash/bucket equi-join (shuffle on bucket key), with exact
  * verification only inside buckets.
  */
object Dedup {

  /** Exact dedup via normalized-text fingerprint: one hash-groupBy
    * (single shuffle, partial-agg). Returns one row per distinct
    * fingerprint with the group size and the kept (minimum) id. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** Keep exactly one row per fingerprint (the min-id row): the
    * dedup "apply" step. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .join(exactGroups(df, idCol, textCol).select(col("fingerprint"),
        col("keeper").as(idCol)), Seq("fingerprint", idCol))
      .drop("fingerprint")

  /** Distinct word-n-gram shingles per document (the comparison units
    * for near-dup detection). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** EXACT n-gram Jaccard near-dup pairs >= `threshold`.
    *
    * Candidate generation is a shingle equi-join (pairs must share at
    * least one shingle) — NOT an all-pairs cross join; at 100 TB the
    * join shuffles on the shingle hash and common-shingle skew is the
    * known hazard (mitigate upstream by dropping ultra-frequent
    * shingles, cf. stopword shingle filtering). Exact and oracle-able;
    * for billion-doc scale prefer [[minHashLshPairs]].
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
  }

  /** MinHash signature: `numHashes` independent min-hashes of the
    * shingle set, each `min(xxhash64(shingle, seed_i))`. Pure HOF
    * composition (nested transform/array_min) — codegen'd per row. */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(s, i))))

  /** MinHash + LSH banding: signatures are cut into `bands` bands of
    * `numHashes/bands` rows; docs colliding in ANY band become
    * candidates; candidates are verified with exact Jaccard.
    *
    * Scale shape: per doc we emit `bands` (bucket-key, id) rows — a
    * fixed small blow-up — then ONE shuffle on the bucket key, exact
    * verification only within buckets. This is the billion-document
    * near-dup path (vs [[ngramJaccardPairs]]'s shared-shingle join).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .withColumn("sh", TextFunctions.wordShingles(col(textCol), n))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
    val buckets = withSig.select(col(idCol),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows))).as("bh"))))
          .as("bucket"))
      .select(col(idCol), col("bucket.band"), col("bucket.bh"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    // exact verification on the candidate set only
    val sh = shingles(df, idCol, textCol, n)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: bit b is set when the
    * majority of token hashes have bit b set (duplicate tokens weight
    * naturally). Pure expression composition. */
  def simHash64(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val nTok = size(hashes)
    // bit positions are known at plan-build time -> unrolled (shift
    // amounts must be literals in Spark's shiftleft/shiftright)
    val packed = (0 until 64).map { b =>
      shiftleft(
        when(lit(2) * size(filter(hashes,
          h => shiftright(h, b).bitwiseAND(1L) === 1L)) >= nTok,
          lit(1L)).otherwise(lit(0L)), b)
    }.reduce(_ + _)
    when(nTok === 0, lit(0L)).otherwise(packed)
  }

  /** SimHash near-dup pairs with Hamming distance <= `maxDist`,
    * candidate-generated by 16-bit chunk collision (pigeonhole: any
    * pair at distance <= 3 shares at least one of 4 chunks; higher
    * `maxDist` trades recall). One equi-join shuffle on (chunk index,
    * chunk value). */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol), simHash64(col(textCol)).as("sig"))
    val chunks = sigs.select(col(idCol), col("sig"),
        explode(array((0 until 4).map(c => struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("cv"))): _*))
          .as("ch"))
      .select(col(idCol), col("sig"), col("ch.chunk"), col("ch.cv"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("bigint"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
