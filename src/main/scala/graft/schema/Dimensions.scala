package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inline literal dimensions the reference hard-codes in script bodies
  * (FIXTURES.md §12) — here as proper generated dimension tables so
  * calendar/period membership becomes a broadcast join instead of
  * per-row string-list scans (`3c.:50-60`).
  */
object Dimensions {

  private val FiscalMonths = Seq(
    "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
    "Jan", "Feb", "Mar")

  /** `year_lkup(y, l)` (`1b.:58-68`): the fiscal-year month calendar —
    * AprYY..DecYY then JanYY+1..MarYY+1 — truncated to `l` months, with
    * the publication-series tag `"YYYY+1"`. */
  def yearLookup(spark: SparkSession, y: Int, l: Int = 12): DataFrame = {
    import spark.implicits._
    val rows = FiscalMonths.zipWithIndex.take(l).map { case (m, i) =>
      val yr = if (i < 9) y else y + 1
      (s"$m$yr", s"$y${y + 1}")
    }
    rows.toDF("month", "series")
  }

  /** The reference's full scrape input calendar (`1b.:72-79`):
    * fiscal years 2018..2024 complete + 2025 through December. */
  def scrapeCalendar(spark: SparkSession): DataFrame =
    (Seq(yearLookup(spark, 25, 9)) ++ (18 to 24).reverse.map(yearLookup(spark, _)))
      .reduce(_.unionByName(_))

  /** COVID period dimension (`3b.:84-87`): month-date -> period tag.
    * Boundaries parameterized (reference defaults: pandemic onset
    * 2020-03, reopening 2021-06) so the same operator tags any
    * three-era split — the test corpus's 1992-1998 dates use shifted
    * boundaries. */
  def covidPeriod(d: org.apache.spark.sql.Column,
      onset: String = "2020-03-01",
      reopen: String = "2021-06-01"): org.apache.spark.sql.Column =
    when(d < to_date(lit(onset)), "Pre")
      .when(d < to_date(lit(reopen)), "During")
      .otherwise("Post")

  /** ONS 9-region 2020 populations (`3c.:431-441`), title-cased like
    * the reference's `str_to_title` post-step. */
  def regionPop2020(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("North East", 2680763L), ("North West", 7367456L),
      ("Yorkshire And The Humber", 5526350L), ("East Midlands", 4865583L),
      ("West Midlands", 5961929L), ("East Of England", 6269161L),
      ("London", 9002488L), ("South East", 9217265L),
      ("South West", 5659143L))
      .toDF("region", "pop20")
  }

  /** NHS 7-region 2022 populations with Y-codes (`blog:75-79`). */
  def regionPop2022(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("London", "Y56", 8866180L), ("South East", "Y59", 9073701L),
      ("South West", "Y58", 5771573L), ("Midlands", "Y60", 10956592L),
      ("North East and Yorkshire", "Y63", 8540584L),
      ("East of England", "Y61", 6697937L), ("North West", "Y62", 7199831L))
      .toDF("name", "region", "pop20")
  }
}
