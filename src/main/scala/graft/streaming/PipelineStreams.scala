package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** Training-data pipeline operators as STREAMS — the ingest-time shape
  * of corpus hygiene: documents arrive in drops (crawl snapshots,
  * vendor deliveries) and dedup must happen against everything already
  * accepted, without re-scanning the accepted corpus per drop.
  *
  * Streaming exact dedup: a document is emitted iff its normalized-
  * text fingerprint was never seen in any earlier micro-batch. State
  * is ONE BOOLEAN per distinct fingerprint in the state store —
  * hash-partitioned across executors, incremental per batch, bounded
  * by corpus cardinality (compaction/TTL via `GroupStateTimeout` drops
  * in when upstream guarantees an arrival horizon). At 100 TB this is
  * the difference between an O(corpus) shuffle per monthly drop (the
  * batch [[graft.dedup.Dedup.exactDedup]] re-run) and O(drop) work
  * per drop.
  */
object PipelineStreams {

  /** `documents`-shaped drop-folder schema (one parquet file per
    * arriving batch). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  final case class FpDoc(fingerprint: String, doc_id: Long)
  /** First-seen emission: the doc that claimed the fingerprint. */
  final case class Keeper(fingerprint: String, keeper: Long)

  /** Emit exactly one [[Keeper]] per distinct fingerprint, on the
    * micro-batch where it first appears; later sightings are filtered
    * by state. Within one batch the minimum doc id wins, so drops that
    * arrive in id order keep the globally-minimal doc — the batch
    * [[graft.dedup.Dedup.exactGroups]] keeper contract. */
  def firstSeenDedup(docs: DataFrame): Dataset[Keeper] = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(TextFunctions.fingerprint(col("text")).as("fingerprint"),
        col("doc_id"))
      .as[FpDoc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, Keeper](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[FpDoc], state: GroupState[Boolean]) =>
          if (state.exists) {
            rows.foreach(_ => ()) // drain: sightings after the first emit nothing
            Iterator.empty
          } else {
            state.update(true)
            Iterator.single(Keeper(fp, rows.map(_.doc_id).min))
          }
      }
  }
}
