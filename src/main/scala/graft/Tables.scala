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

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it with the
    * legacy nanos-as-long conf and surface BOTH the raw nanos (`ts_ns`,
    * bigint) and a proper microsecond `ts` timestamp. Integer `div` —
    * not `/` — because nano epochs (~1.7e18) exceed a double's exact
    * integer range (2^53). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
