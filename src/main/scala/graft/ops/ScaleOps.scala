package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out join utilities: skew salting and bucketed co-location.
  * Nothing here changes results — only physical distribution; every
  * helper is exercised by ScaleOpsSpec which asserts both result
  * equality and the intended plan shape.
  */
object ScaleOps {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, buckets); the small side is EXPLODED `buckets`
    * ways so every (key, salt) partner exists. The shuffle then
    * spreads each hot key over `buckets` reducers instead of one.
    *
    * Use when AQE's skew-join split isn't available/enough (e.g. the
    * skew is in a hash-aggregate, or a single key exceeds one
    * executor). Results are identical to a plain inner/left join on
    * `key` (salt is internal).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = large.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial) aggregation for skewed GROUP BY keys: first
    * aggregate on (key, salt) — spreading a hot key over `buckets`
    * partial groups — then combine partials on key alone. Caller
    * supplies re-associable aggregates: `partial` runs per (key,salt),
    * `combine` merges partials per key (e.g. sum/sum, count/sum,
    * min/min). */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)

  /** Write both join sides bucketed by the join key: subsequent joins
    * between the saved tables shuffle NEITHER side (bucket-aware scan
    * feeds SortMergeJoin directly). The 100 TB answer to repeated
    * fact-to-fact joins on one key. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** SMALL-FILES COMPACTION for a parquet path — the lake-hygiene op
    * every incremental pipeline needs: micro-batch/per-drop sinks
    * accumulate thousands of KB-sized files, and at 100 TB the
    * listing + per-file open cost starts to dominate scans. Rewrites
    * the path at `ceil(totalBytes / targetBytes)` files via a
    * round-robin `repartition` (even output sizes — `coalesce` would
    * merge unevenly and can collapse upstream parallelism).
    *
    * Only file METADATA is listed driver-side (names + sizes — the
    * same listing every scan does anyway); the data itself moves
    * through one distributed read -> shuffle -> write. Returns the
    * output file count. Content is untouched — that is the
    * q_k4_compaction gate's claim. */
  def compactPath(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }
}
