package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Ingest
import graft.schema.{Dimensions, RttSchema}
import graft.stats.DashboardStats

/** SURVEY.md §7.2 — the minimum end-to-end slice, from raw wide CSV to
  * dashboard stats: mangled-name CSV scan (S1) -> wide-to-array
  * normalization (P3/R3) -> monthly append with IS flag (U1+J4) ->
  * dashboard cube with ENGLAND rollup + quantiles + rates +
  * suppression (A2, A12-A15, A17). Golden values hand-computed. */
class E2ESliceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wide CSV -> normalized fact -> dashboard stats (hand-computed goldens)") {
    // 1. write a raw wide-format monthly extract as CSV (headers with
    // spaces, as shipped by the source system)
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    Seq(
      // P1: 10 in band1, 30 in band2 (total 40)
      ("RTT-APRIL-2021", "P1", "C1", "Incomplete Pathways", "Total", 10L, 30L, 0L, 40L),
      // P2: 25 in band2 (total 25)
      ("RTT-APRIL-2021", "P2", "C1", "Incomplete Pathways", "Total", 0L, 25L, 0L, 25L),
      // NONC row must be excluded
      ("RTT-APRIL-2021", "P1", "NONC", "Incomplete Pathways", "Total", 999L, 0L, 0L, 999L))
      .toDF("Period", "Provider Org Code", "Commissioner Org Code",
        "RTT Part Description", "Treatment Function Name",
        "Gt 00 To 01 Weeks SUM 1", "Gt 01 To 02 Weeks SUM 1",
        "Patients with unknown clock start date", "Total All")
      .write.option("header", "true").csv(s"$dir/apr21")

    // 2. scan with the fread shim (names mangled to dotted form)
    val raw = Ingest.csvMangledNames(spark, s"$dir/apr21", inferSchema = true)
    assert(raw.columns.contains("Gt.00.To.01.Weeks.SUM.1"))

    // 3. normalize: band array + canonical pathway + monthly tag + IS flag
    val membership = Seq(("Apr21", "P2")).toDF("monthyr", "codes")
    val fact0 = Ingest.appendMonths(Seq("Apr21" ->
      RttSchema.normalizeWeeks(raw)))
    val fact = Ingest.withIsProviderFlag(fact0, membership,
        factCode = "Provider.Org.Code")
      .select(
        col("monthyr"),
        col("`Provider.Org.Code`").as("provider"),
        col("`Treatment.Function.Name`").as("specialty"),
        DashboardStats.canonicalPathway(col("`RTT.Part.Description`")).as("pathway"),
        col("IS_provider").as("is_provider"),
        col("weeks"),
        col("`Patients.with.unknown.clock.start.date`").cast("bigint").as("unknown_start"),
        col("`Total.All`").cast("bigint").as("total_all"),
        col("`Commissioner.Org.Code`").as("commissioner_code"))

    // 4. dashboard cube
    val stats = DashboardStats.compute(fact, "provider",
      DashboardStats.Config(maxBands = 2)).cache()

    // P1 Non-IS: total 40 (NONC excluded), median: target 20 -> band 2
    // (cum 10,40) -> 1 week
    val p1 = stats.filter($"grp" === "P1" && $"is_slice" === "Non-IS").head
    assert(p1.getAs[Long]("total_patients") == 40L)
    assert(p1.getAs[Long]("weeks_50") == 1L)
    // P2 IS slice exists (membership join), total 25, median target
    // 12.5 -> band 2 -> 1
    val p2 = stats.filter($"grp" === "P2" && $"is_slice" === "IS").head
    assert(p2.getAs[Long]("total_patients") == 25L)
    assert(p2.getAs[Long]("weeks_50") == 1L)
    // ENGLAND/All: 65 patients, cum (10, 65); median target 32.5 -> 1
    val eng = stats.filter($"grp" === "ENGLAND" && $"is_slice" === "All").head
    assert(eng.getAs[Long]("total_patients") == 65L)
    assert(eng.getAs[Long]("weeks_50") == 1L)
    // rate <=18wk: bands clamp at 2 -> 100% (1000 in x10 fixed point)
    assert(eng.getAs[Long]("rate_18wks_or_less_x10") == 1000L)

    // 5. partitioned sink round-trip (K2) with month pruning
    Ingest.writePartitioned(fact, s"$dir/fact")
    val back = spark.read.parquet(s"$dir/fact").filter($"monthyr" === "Apr21")
    assert(back.count() == 3)

    // calendar dimension sanity (year_lkup semantics)
    val cal = Dimensions.yearLookup(spark, 21, 12).collect()
    assert(cal.head.getString(0) == "Apr21" && cal.last.getString(0) == "Mar22")
    assert(cal.forall(_.getString(1) == "2122"))
    assert(Dimensions.scrapeCalendar(spark).count() == 9 + 7 * 12)
  }
}
