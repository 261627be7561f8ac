package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.RelationalOps

/** Source readers and the monthly-append ingest pipeline (SURVEY.md §2
  * S1/S2/K1/K2, §3 E1).
  *
  * The reference builds its fact table by appending one CSV "full
  * extract" per month (`1b.:361-392`): `fread` with `check.names=TRUE`
  * (R mangles non-alphanumeric header chars to `.`), tag `monthyr`,
  * flag IS providers against that month's membership list, rbind.fill,
  * write one giant CSV. Here: the same semantics, but the sink is
  * month-partitioned parquet (the reference's own author converged on
  * partitioned columnar storage, `3a.:345-349`) so every downstream
  * month filter becomes partition pruning.
  */
object Ingest {

  /** S1 — header CSV with R `fread(check.names=TRUE)` name mangling
    * (R `make.names`: every char outside [A-Za-z0-9_.] becomes `.`,
    * e.g. `Gt 00 To 01 Weeks SUM 1` -> `Gt.00.To.01.Weeks.SUM.1`;
    * underscores survive). */
  def csvMangledNames(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    val df = schema.map(base.schema).getOrElse(base.option("inferSchema", "true"))
      .csv(path)
    df.columns.foldLeft(df) { (d, c) =>
      val mangled = c.replaceAll("[^A-Za-z0-9_.]", ".")
      if (mangled == c) d else d.withColumnRenamed(c, mangled)
    }
  }

  /** S2 — headerless CSV with positional columns `V1..Vn` renamed to
    * the caller's names (NHS org reference files, `1c.:78-123`). Pass
    * only the names you keep: `keep` maps 1-based positions. */
  def headerlessCsv(spark: SparkSession, path: String,
      keep: Map[Int, String]): DataFrame = {
    val raw = spark.read.option("header", "false").csv(path)
    raw.select(keep.toSeq.sortBy(_._1).map { case (pos, name) =>
      col(s"_c${pos - 1}").as(name)
    }: _*)
  }

  /** E1 steps 4-5 — append per-month extracts by name (era drift:
    * missing columns null-fill), tagging each with its `monthyr`. */
  def appendMonths(months: Seq[(String, DataFrame)]): DataFrame =
    RelationalOps.rbindFill(months.map { case (m, df) =>
      df.withColumn("monthyr", lit(m))
    })

  /** J4 — IS membership flag: `IS_provider = code %in% that month's
    * list` (`1b.:380`), as a broadcast left join on (monthyr, code). */
  def withIsProviderFlag(fact: DataFrame, membership: DataFrame,
      factCode: String = "Provider_Org_Code",
      memberCode: String = "codes"): DataFrame = {
    val m = membership
      .select(col("monthyr"), col(memberCode).as(factCode))
      .distinct()
      .withColumn("__is", lit(1))
    fact.join(broadcast(m), Seq("monthyr", factCode), "left")
      .withColumn("IS_provider", coalesce(col("__is"), lit(0)))
      .drop("__is")
  }

  /** K2 — month-partitioned parquet sink; idempotent per-month
    * re-ingest via dynamic partition overwrite (only the months
    * present in `df` are replaced — the incremental-ingest idiom,
    * `1b.:169-179`, without truncating history). */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("monthyr")
      .parquet(path)

  /** K1 — single-file CSV sink (reference export shape, `1b.:392`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)
}
