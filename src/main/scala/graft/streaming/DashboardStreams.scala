package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{HistogramOps => H}

/** Incremental dashboard-cube maintenance — the reference's monthly
  * append-then-recompute workflow (`1b.:169-179` download loop feeding
  * `3b.:44-57`'s full recompute) as a Structured Streaming job over
  * the normalized-fact drop folder.
  *
  * Architecture: only STEP 1 of [[graft.stats.DashboardStats]] (the
  * fact-grain aggregation — the single fact-volume shuffle) runs
  * incrementally; its state is one row per (month x group x specialty
  * x pathway x IS) cell, which is dimension-sized, bounded, and
  * keyed so each monthly drop only touches its own month's state.
  * Steps 2-3 (rollups, quantiles, rates) stay batch work over the
  * small base — call [[graft.stats.DashboardStats.statsFromBase]] on
  * the sink after each trigger. At 100 TB/month this is the difference
  * between re-scanning all history per month and scanning each month
  * once, ever.
  *
  * The band vector aggregates with the expression-level
  * [[H.sumBands]] (plain sum aggregates — the streaming state store
  * serializes standard agg buffers; the typed-imperative
  * [[graft.plans.BandSumAgg]] stays on the batch path).
  */
object DashboardStreams {

  /** Normalized-fact schema expected in the drop folder (SURVEY §1.2,
    * the output shape of RttSchema.normalizeWeeks + Ingest tagging).
    * Band count doesn't appear here — `weeks` is a variable-length
    * array column whatever the era's width. */
  val factSchema: StructType = StructType(Seq(
    StructField("monthyr", StringType),
    StructField("provider", StringType),
    StructField("specialty", StringType),
    StructField("pathway", StringType),
    StructField("is_provider", IntegerType),
    StructField("weeks", ArrayType(LongType)),
    StructField("unknown_start", LongType),
    StructField("total_all", LongType),
    StructField("commissioner_code", StringType)))

  /** File-source stream over a drop folder of normalized-fact parquet
    * (one file per monthly ingest). */
  def readFacts(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(factSchema).parquet(path)

  /** Step-1 base, incrementally maintained: same grain, same NONC
    * exclusion, same band/unknown/total sums as the batch cube.
    * Run with `outputMode(Complete)` into a memory/table sink (the
    * base is dimension-sized), or Update mode into a keyed store. */
  def incrementalBase(facts: DataFrame, groupCol: String = "provider",
      maxBands: Int = 105): DataFrame =
    facts.filter(col("commissioner_code") =!= "NONC")
      .groupBy(col("monthyr"), col(groupCol).cast("string").as("grp"),
        col("specialty"), col("pathway"), col("is_provider"))
      .agg(
        H.sumBands(col("weeks"), maxBands).as("weeks"),
        coalesce(sum("unknown_start"), lit(0L)).as("unknown_start"),
        coalesce(sum("total_all"), lit(0L)).as("total_all"))
}
