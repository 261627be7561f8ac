package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** E1 replication (SURVEY.md §3): monthly append with era drift, IS
  * membership flagging, month-partitioned parquet sink, and the
  * partition-pruning payoff on read. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appendMonths: union-by-name across era drift + monthyr tag") {
    // old era: 2 band columns; new era adds Gt53
    val apr = Seq(("P1", 10L, 5L)).toDF("code", "Gt1", "Gt2")
    val may = Seq(("P1", 1L, 2L, 3L)).toDF("code", "Gt1", "Gt2", "Gt53")
    val fact = Ingest.appendMonths(Seq("Apr20" -> apr, "May21" -> may))
    assert(fact.columns.toSet == Set("code", "Gt1", "Gt2", "Gt53", "monthyr"))
    val aprRow = fact.filter($"monthyr" === "Apr20").head
    assert(aprRow.isNullAt(aprRow.fieldIndex("Gt53"))) // era drift -> null fill
    assert(fact.count() == 2)
  }

  test("IS flag joins per-month membership (flips between months)") {
    val fact = Seq(("Apr20", "P1"), ("Apr20", "P2"), ("May20", "P1"))
      .toDF("monthyr", "Provider_Org_Code")
    val membership = Seq(("Apr20", "P1")).toDF("monthyr", "codes")
    val flagged = Ingest.withIsProviderFlag(fact, membership)
      .select("monthyr", "Provider_Org_Code", "IS_provider")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(flagged == Set(("Apr20", "P1", 1), ("Apr20", "P2", 0), ("May20", "P1", 0)))
  }

  test("partitioned sink: dynamic overwrite replaces only re-ingested months; reads prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ing").toString + "/fact"
    val v1 = Seq(("Apr20", "P1", 1L), ("May20", "P1", 2L))
      .toDF("monthyr", "code", "v")
    Ingest.writePartitioned(v1, dir)
    // re-ingest May only, with corrected value
    val v2 = Seq(("May20", "P1", 99L)).toDF("monthyr", "code", "v")
    Ingest.writePartitioned(v2, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2) // Apr kept, May replaced (not appended)
    assert(back.filter($"monthyr" === "May20").head.getAs[Long]("v") == 99L)
    // month filter is partition pruning, not a data scan of all months
    val plan = back.filter($"monthyr" === "Apr20")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("May20"))
  }

  test("csv mangled-name shim mirrors R make.names") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/c"
    Seq((1, 2.0)).toDF("Provider Org Code", "Total-All")
      .write.option("header", "true").csv(dir)
    val cols = Ingest.csvMangledNames(spark, dir).columns.toSet
    assert(cols == Set("Provider.Org.Code", "Total.All"))
  }

  test("headerless csv positional selection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hcsv").toString + "/c"
    Seq(("RX1", "TRUST A", "ig1", "AB1 2CD")).toDF("a", "b", "c", "d")
      .write.option("header", "false").csv(dir)
    val got = Ingest.headerlessCsv(spark, dir,
      Map(1 -> "provider_code", 2 -> "provider_name", 4 -> "pcode")).head
    assert(got.getString(0) == "RX1" && got.getString(1) == "TRUST A"
      && got.getString(2) == "AB1 2CD")
  }
}
