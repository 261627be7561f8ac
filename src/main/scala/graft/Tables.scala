package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star-schema parquet tables
  * (see TESTDATA.md). Every query receives an `sfDir` such as
  * `/root/testdata/sf0.01`; tables are plain parquet files inside it.
  *
  * Scale note: at 100 TB the fact tables (lineitem/orders/events)
  * would be directory-partitioned (e.g. by month, cf. SURVEY.md §1.2
  * `monthyr`) — the readers here go through a single entry point so a
  * partitioned layout is a one-line change, and all filters in the
  * query layer are expressed on plain columns so Catalyst pushes them
  * into the scan (PushedFilters) either way.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** The `events.ts` on-disk encoding has varied across driver data
    * generations: INT64 TIMESTAMP(NANOS) (readable only via the legacy
    * nanos-as-long conf — Spark rejects TIMESTAMP(NANOS) natively) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    * [[normalizeEventTs]] accepts either — plus a plain bigint-nanos
    * column, the shape test fixtures write — so every consumer sees one
    * contract: `ts_ns` (bigint epoch nanos) + `ts` (microsecond
    * timestamp). Integer `div` — not `/` — because nano epochs
    * (~1.7e18) exceed a double's exact integer range (2^53). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalize a raw `ts` column of any supported encoding (bigint
    * epoch-nanos, TIMESTAMP, or TIMESTAMP_NTZ) to the `ts_ns` +
    * microsecond-`ts` contract. NTZ casts through TimestampType: the
    * session timezone is pinned to UTC (Verify/Bench/TestSpark), so the
    * cast is epoch-identity, matching DuckDB's `epoch_ns(ts)` oracle
    * arithmetic on the same file. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
