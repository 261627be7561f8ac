package graft.util

import org.apache.spark.sql.DataFrame

/** Scan-split fan-out guard for cached, multiply-consumed relations.
  *
  * A relation derived map-side from a scan (kernel explode, signature
  * projection, bucket expansion) inherits the SCAN's split count. At
  * corpus scale input splits >= cluster parallelism and nothing needs
  * doing — but a small single-file fixture is ONE split, which parks
  * the cached relation, and the map side of every downstream self-join
  * and aggregate that reads it, on a single core (measured: the
  * round-4 shingle-kernel rewrite put q_dedup_clusters from 4.3 s to
  * 10.4 s until guarded). `fanOut` repartitions round-robin ONLY in
  * that degenerate case; the threshold (4x under the session's shuffle
  * parallelism) keeps it a provable no-op on any real multi-split
  * input, so no shuffle is ever added at scale.
  */
object Parallelism {
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // .rdd is undefined on streams
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions * 4 < target) df.repartition(target) else df
  }
}
