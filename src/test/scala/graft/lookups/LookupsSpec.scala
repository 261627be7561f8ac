package graft.lookups

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LookupsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("imdScores filters the long IMD file to 2019 overall scores") {
    val raw = Seq(
      ("E01", "Score", "2019", "a. Index of Multiple Deprivation (IMD)", 40.0),
      ("E01", "Rank", "2019", "a. Index of Multiple Deprivation (IMD)", 3.0),
      ("E01", "Score", "2015", "a. Index of Multiple Deprivation (IMD)", 38.0),
      ("E01", "Score", "2019", "b. Income", 9.0))
      .toDF("FeatureCode", "Measurement", "DateCode", "Indices of Deprivation", "Value")
    val got = Lookups.imdScores(raw).collect()
    assert(got.length == 1 && got.head.getDouble(1) == 40.0)
  }

  test("imdByCcg: population-weighted mean + inverted deciles") {
    // CCG A: LSOAs (score 40, pop 100) and (score 10, pop 300) -> 17.5
    // CCG B..K: spread of scores so deciles are distinct
    val lsoaCcg = (Seq(("L1", "A"), ("L2", "A")) ++
      (1 to 9).map(i => (s"X$i", s"CCG$i"))).toDF("LSOA11CD", "CCGCDH")
    val imd = (Seq(("L1", 40.0), ("L2", 10.0)) ++
      (1 to 9).map(i => (s"X$i", i * 5.0))).toDF("LSOA11CD", "IMD19_score")
    val pop = (Seq(("L1", 100L), ("L2", 300L)) ++
      (1 to 9).map(i => (s"X$i", 50L))).toDF("LSOA11CD", "pop19")
    val got = Lookups.imdByCcg(lsoaCcg, imd, pop).cache()
    val a = got.filter($"CCGCDH" === "A").head
    assert(math.abs(a.getAs[Double]("IMD19_score") - 17.5) < 1e-12)
    // highest score -> decile 1 (most deprived): CCG9 has 45.0 (max)
    val top = got.orderBy(desc("IMD19_score")).head
    assert(top.getAs[Int]("IMD19_decile") == 1)
    val bottom = got.orderBy(asc("IMD19_score")).head
    assert(bottom.getAs[Int]("IMD19_decile") == 10)
  }

  test("ccgRegionAcrossVintages: rename, null-fill STP, keep newest vintage") {
    val v2018 = Seq(("C1", "North")).toDF("CCG18CDH", "NHSER18NM") // no STP
    val v2021 = Seq(("C1", "North East"), ("C2", "South"))
      .toDF("CCG21CDH", "NHSER21NM")
      .withColumn("STP21NM", lit("Some STP"))
    val got = Lookups.ccgRegionAcrossVintages(
      Seq("2018" -> v2018, "2021" -> v2021)).cache()
    assert(got.count() == 2)
    val c1 = got.filter($"CCGCDH" === "C1").head
    // newest vintage wins
    assert(c1.getAs[String]("NHSERNM") == "North East")
    assert(c1.getAs[String]("vintage") == "2021")
  }

  test("providerToImdRegion: spatial assign + attribute join, unmatched kept") {
    val providers = Seq(("P1", 0.5, 0.5), ("P2", 99.0, 99.0))
      .toDF("code", "long", "lat")
    val polys = Seq(("M1", Seq(0.0, 1.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0)))
      .toDF("msoa11cd", "xs", "ys")
      .select($"msoa11cd", graft.spatial.Spatial.polygon($"xs", $"ys").as("poly"))
    val imd = Seq(("M1", 3, 2, "NORTH WEST")).toDF(
      "msoa11cd", "IMD19_decile", "IMD19_quintile", "region")
    val got = Lookups.providerToImdRegion(providers, polys, imd).cache()
    val p1 = got.filter($"code" === "P1").head
    assert(p1.getAs[String]("msoa11cd") == "M1" &&
      p1.getAs[Int]("IMD19_decile") == 3)
    val p2 = got.filter($"code" === "P2").head
    assert(p2.isNullAt(p2.fieldIndex("msoa11cd"))) // left-join unmatched path
  }
}
