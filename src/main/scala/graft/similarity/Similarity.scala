package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join with
  * codegen'd HOF arithmetic (zip_with product + sequential aggregate
  * sum in double). Scale path: sign-random-projection LSH bucketing —
  * candidates share a bucket key, so the join is an equi-join shuffle
  * instead of a cross product (the 100 TB shape; recall is tunable via
  * number of planes / tables).
  */
object Similarity {

  /** Elementwise-cast to double then dot product; sequential
    * left-to-right summation (deterministic per pair). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0 || d.isNull, lit(null).cast("double"))
      .otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine top-k: every query row against every corpus
    * row. Queries are broadcast (the small side by construction);
    * ranking uses the ROUNDED similarity (stable across engines /
    * summation orders) with the corpus id as tiebreaker. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, simDecimals: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), simDecimals))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic random hyperplanes: `planes` x `dim` components in
    * [-1,1] from a seeded LCG (java.util.Random is spec-stable). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-random-projection bucket key: bit p = (v . plane_p) > 0,
    * packed into a long. Vectors in the same bucket are "probably
    * close" candidates. */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      shiftleft(when(dot(vec, planeLit) > 0, lit(1L)).otherwise(lit(0L)), i)
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: equi-join on the SRP bucket key
    * (+ multi-probe over `tables` independent plane sets to recover
    * recall), exact cosine only within buckets. The scale path: the
    * cross join becomes shuffle-on-bucket; each table is one cheap
    * column. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 5, tables: Int = 10,
      simDecimals: Int = 4): DataFrame = {
    val planeSets = (0 until tables)
      .map(t => hyperplanes(planes, dimOf(corpus, vecCol), seed = 42L + t))
    def withBuckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(id + "_v"),
        explode(array(planeSets.zipWithIndex.map { case (ps, t) =>
          struct(lit(t).as("t"), srpBucket(col(vecCol), ps).as("b"))
        }: _*)).as("bk"))
        .select(col(id), col(id + "_v"), col("bk.t"), col("bk.b"))
    val qb = withBuckets(queries, "query_id")
    val cb = withBuckets(corpus, "neighbor_id")
    val candidates = qb.join(cb, Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
      .distinct()
    val scored = candidates
      .withColumn("sim",
        round(cosine(col("query_id_v"), col("neighbor_id_v")), simDecimals))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  private def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** EXACT all-pairs cosine near-dup above `threshold` — brute force,
    * for corpora small enough to cross-join (or as the per-bucket
    * verifier). Oracle-able. */
  def bruteForceNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    broadcast(a).crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Embedding-cosine near-dup pairs above `threshold`, LSH-bucketed
    * exactly like [[lshTopK]] (no cross join). NOTE: SRP buckets only
    * concentrate HIGH-cosine pairs; recall degrades as the threshold
    * approaches the background similarity of the corpus. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 5, tables: Int = 10): DataFrame = {
    val planeSets = (0 until tables)
      .map(t => hyperplanes(planes, dimOf(df, vecCol), seed = 42L + t))
    val b = df.select(col(idCol), col(vecCol).as("v"),
        explode(array(planeSets.zipWithIndex.map { case (ps, t) =>
          struct(lit(t).as("t"), srpBucket(col(vecCol), ps).as("b"))
        }: _*)).as("bk"))
      .select(col(idCol), col("v"), col("bk.t"), col("bk.b"))
    b.as("a").join(b.as("b2"),
        col("a.t") === col("b2.t") && col("a.b") === col("b2.b") &&
          col(s"a.$idCol") < col(s"b2.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b2.$idCol").as("id_b"),
        col("a.v").as("va"), col("b2.v").as("vb"))
      .distinct()
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
