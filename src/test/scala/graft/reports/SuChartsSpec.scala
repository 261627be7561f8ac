package graft.reports

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden end-to-end: replicate the reference's SU chart tables from
  * its own checked-in CSVs (read-only under /root/reference). Golden
  * values below were independently computed from the raw CSVs. */
class SuChartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dataDir = "/root/reference/Strategy Unit Update/Data"
  private val nat = "National trends in independent sector trends in provision of elective care.csv"

  test("chart2: IS/NHS volumes + share blocks match the raw CSV") {
    val raw = SuCharts.readSuCsv(spark, s"$dataDir/1-3-2 $nat")
    val c2 = SuCharts.chart2(raw).cache()
    // golden: Ophthalmology 2018-02-01 -> IS 8789, NHS 44900
    val vol = c2.filter($"speciality" === "Ophthalmology" &&
      $"Grid" === "Number of treatments" &&
      $"der_activity_month" === lit("2018-02-01").cast("date")).head
    assert(vol.getAs[Double]("Independent Sector") == 8789.0)
    assert(vol.getAs[Double]("NHS") == 44900.0)
    assert(vol.isNullAt(vol.fieldIndex(
      "Independent sector share of total treatments (%)")))
    val share = c2.filter($"speciality" === "Ophthalmology" &&
      $"Grid" =!= "Number of treatments" &&
      $"der_activity_month" === lit("2018-02-01").cast("date")).head
    val expected = 8789.0 / (8789.0 + 44900.0) * 100
    assert(math.abs(share.getAs[Double](
      "Independent sector share of total treatments (%)") - expected) < 1e-9)
    assert(share.isNullAt(share.fieldIndex("NHS")))
    // structure: both Grid blocks, same month count in each
    val counts = c2.groupBy("Grid").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet.size == 1 && counts.size == 2)
  }

  test("chart3 heatmap: data-driven region ordering matches reference semantics") {
    val eye = SuCharts.readSuCsv(spark,
      s"$dataDir/1-1-1 Sub-national ophthalmic trends in independent sector provision of elective care.csv")
    val ortho = SuCharts.readSuCsv(spark,
      s"$dataDir/1-1-1 Sub-national orthopaedic trends in independent sector provision of elective care.csv")
    val c3 = SuCharts.chart3Heat(eye, ortho).cache()
    // golden ordering (mean ophthalmic IS share since 2022, desc)
    val order = c3.select("region", "region_rank").distinct()
      .orderBy("region_rank").collect().map(_.getString(0)).toSeq
    assert(order == Seq("North West", "South West", "Midlands",
      "North East and Yorkshire", "East of England", "South East", "London"))
    // monthyear label shape "Feb 18"
    val lbl = c3.filter($"der_activity_month" === lit("2018-02-01").cast("date"))
      .select("monthyear").head.getString(0)
    assert(lbl == "Feb 18")
    assert(c3.select("specialty").distinct().count() == 2)
  }

  test("chart4: deprivation quintiles pivot wide with labelled extremes") {
    val raw = SuCharts.readSuCsv(spark, s"$dataDir/4-2-3 $nat")
    val c4 = SuCharts.chart4(raw, "Ophthalmology").cache()
    val r = c4.filter($"der_activity_month" === lit("2018-02-01").cast("date")).head
    assert(math.abs(r.getAs[Double]("1 (most deprived)") - 15.8467168123602) < 1e-9)
    assert(math.abs(r.getAs[Double]("5 (least deprived)") - 17.2065139584825) < 1e-9)
    assert(c4.columns.toSeq == Seq("specialty", "der_activity_month",
      "1 (most deprived)", "2", "3", "4", "5 (least deprived)"))
  }
}
