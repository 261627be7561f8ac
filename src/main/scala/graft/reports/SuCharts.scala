package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Strategy-Unit chart-table derivations (`Strategy Unit
  * Update/Charts.R`) — the reference's share/pivot reporting layer,
  * reproduced over its own checked-in long-format trend CSVs (which
  * double as golden inputs, SURVEY.md §5-3).
  *
  * All inputs are small aggregate tables (hundreds of rows); every
  * transform is a plain Catalyst plan so the same code scales if the
  * inputs ever arrive at fact-table size.
  */
object SuCharts {

  /** SU CSV reader: header CSV whose first column is an unnamed R row
    * index (`select(-1)`, SU:40). */
  def readSuCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)
    df.drop(df.columns.head)
  }

  private val IS = "Independent Sector"
  private val ShareCol = "Independent sector share of total treatments (%)"

  /** Chart 2 (SU:39-102): per (speciality, month), IS vs NHS inpatient
    * volumes wide, then a second block with the IS share of the total —
    * stacked "Grid" sections like the reference's chart table. */
  def chart2(raw: DataFrame): DataFrame = {
    val wide = raw
      .filter(col("name") === "Inpatient admissions")
      .groupBy("speciality", "der_activity_month")
      .pivot("type", Seq(IS, "NHS"))
      .agg(first("value"))
    val partA = wide.select(
      col("speciality"), col("der_activity_month"),
      lit("Number of treatments").as("Grid"),
      lit(null).cast("double").as(ShareCol),
      col(IS), col("NHS"))
    val partB = wide.select(
      col("speciality"), col("der_activity_month"),
      lit(ShareCol).as("Grid"),
      (col(IS) / (col(IS) + col("NHS")) * 100).as(ShareCol),
      lit(null).cast("double").as(IS),
      lit(null).cast("double").as("NHS"))
    RelationalOps.rbindFill(Seq(partA, partB))
      .orderBy(col("speciality"), col("Grid").desc, col("der_activity_month"))
  }

  /** Chart 3 heatmap (SU:135-183): sub-national IS share trends for two
    * specialties, with DATA-DRIVEN region ordering — regions ranked by
    * mean ophthalmology share since 2022 (O2's data-driven branch:
    * compute order table, join rank, sort by it). */
  def chart3Heat(eyeRaw: DataFrame, orthoRaw: DataFrame): DataFrame = {
    def prep(raw: DataFrame, specialty: String): DataFrame =
      raw.filter(col("sector") === IS && col("name") === "Inpatient admissions")
        .select(col("der_activity_month"), col("var_1").as("region"),
          lit(specialty).as("specialty"), col("prop"),
          concat(date_format(col("der_activity_month"), "MMM"), lit(" "),
            date_format(col("der_activity_month"), "yy")).as("monthyear"))
    val all = RelationalOps.rbindFill(
      Seq(prep(eyeRaw, "Ophthalmology"), prep(orthoRaw, "Orthopaedic")))
    val order = all
      .filter(col("der_activity_month") >= lit("2022-01-01").cast("date") &&
        col("specialty") === "Ophthalmology")
      .groupBy("region").agg(avg("prop").as("mean_prop"))
      .withColumn("region_rank",
        row_number().over(Window.orderBy(col("mean_prop").desc, col("region"))))
      .select("region", "region_rank")
    all.join(broadcast(order), Seq("region"), "left")
      .orderBy(col("specialty"), col("region_rank"), col("der_activity_month"))
  }

  /** Chart 4 (SU:212-260): deprivation-quintile IS share, quintiles
    * pivoted wide with the reference's labelled extremes. */
  def chart4(raw: DataFrame, specialty: String): DataFrame =
    raw.filter(col("sector") === IS && col("name") === "Inpatient admissions")
      .select(col("var_1").cast("string").as("deprivation"),
        col("der_activity_month"), col("prop"))
      .groupBy("der_activity_month")
      .pivot("deprivation", Seq("1", "2", "3", "4", "5"))
      .agg(first("prop"))
      .select(lit(specialty).as("specialty"), col("der_activity_month"),
        col("1").as("1 (most deprived)"), col("2"), col("3"), col("4"),
        col("5").as("5 (least deprived)"))
      .orderBy("specialty", "der_activity_month")
}
