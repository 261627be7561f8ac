package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.{Geocoder, Ingest}
import graft.lookups.Lookups
import graft.spatial.Spatial

/** Driver-gate queries for the reference's LOOKUP-BUILDING pipelines
  * (`1a. Clean deprivation and regional lookup data.R`, `1c. Look for
  * provider locations.R`) — previously spec-only (LookupsSpec),
  * because the star testdata has no IMD/geography inputs. Each query
  * DERIVES its fixture inputs deterministically from the star tables
  * (and stages the 1a long file through a real CSV leg), so the DuckDB
  * oracle can restate the whole computation from the original parquet.
  *
  * Float-portability note: `q_lkp_imd_ccg` uses `floor(acctbal)` as
  * the score, making both weighted-mean sums integer-valued doubles —
  * exact in ANY summation order (< 2^53), so the quotient, its
  * rounding, and the ntile cut points are bit-identical across
  * engines rather than merely close.
  */
object LookupQueries {
  private type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // 1a — population-weighted IMD per CCG with inverted decile/
    // quintile, fed by the open-data LONG file staged as a real CSV:
    // 4 rows per LSOA (Measurement x DateCode x index variants) of
    // which exactly one is the 2019 overall-IMD Score row; imdScores
    // must pick it and drop the decoys (whose values are poisoned so
    // a wrong pick cannot hash-match).
    "q_lkp_imd_ccg" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val combos = explode(array(
        struct(lit("Score").as("m"), lit("2019").as("dc"),
          lit("a. Index of Multiple Deprivation (IMD)").as("ind")),
        struct(lit("Rank").as("m"), lit("2019").as("dc"),
          lit("a. Index of Multiple Deprivation (IMD)").as("ind")),
        struct(lit("Score").as("m"), lit("2015").as("dc"),
          lit("a. Index of Multiple Deprivation (IMD)").as("ind")),
        struct(lit("Score").as("m"), lit("2019").as("dc"),
          lit("b. Income").as("ind"))))
      val long = cust
        .select(concat(lit("E"), col("c_custkey")).as("FeatureCode"),
          floor(col("c_acctbal")).as("score"), combos.as("c"))
        .select(col("FeatureCode"), col("c.m").as("Measurement"),
          col("c.dc").as("DateCode"),
          col("c.ind").as("Indices of Deprivation"),
          when(col("c.m") === "Score" && col("c.dc") === "2019" &&
              col("c.ind").startsWith("a."), col("score"))
            .otherwise(col("score") * 2 + 17).as("Value"))
      val dir = graft.util.TempDirs.scoped("graft-imd")
      val csv = dir.resolve("imd-long").toString
      Ingest.writeCsv(long, csv)
      // plain header read (the 1a file's column names keep their
      // spaces — no fread mangling on this leg); columns arrive as
      // strings, weightedMean casts
      val imd = Lookups.imdScores(
        s.read.option("header", "true").csv(csv))
      val lsoaCcg = cust.select(
        concat(lit("E"), col("c_custkey")).as("LSOA11CD"),
        concat(lit("CCG"), col("c_nationkey")).as("CCGCDH"))
      val pop = cust.select(
        concat(lit("E"), col("c_custkey")).as("LSOA11CD"),
        (col("c_custkey") % 97 + 1).as("pop19"))
      Lookups.imdByCcg(lsoaCcg, imd, pop)
        .select(col("CCGCDH"), round(col("IMD19_score"), 6).as("imd_score"),
          col("IMD19_decile"), col("IMD19_quintile"))
        .orderBy("CCGCDH")
    }),

    // 1a — CCG -> region across GEOGRAPHY VINTAGES: the 2021 file
    // (vintage-suffixed names, has STP, covers only even-keyed CCGs)
    // unions by name with the 2018 file (no STP column, full
    // coverage); per CCG the NEWEST vintage row wins, older vintages
    // only fill the gaps.
    "q_lkp_vintage_union" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val v21 = n.filter(col("n_nationkey") % 2 === 0).select(
        concat(lit("CCG"), col("n_nationkey")).as("CCG21CDH"),
        concat(lit("R"), col("n_regionkey")).as("NHSER21NM"),
        concat(lit("STP"), col("n_nationkey")).as("STP21NM"))
      val v18 = n.select(
        concat(lit("CCG"), col("n_nationkey")).as("CCG18CDH"),
        concat(lit("OLD"), col("n_regionkey")).as("NHSER18NM"))
      Lookups.ccgRegionAcrossVintages(Seq("2021" -> v21, "2018" -> v18))
        .select(col("CCGCDH"), col("NHSERNM"), col("STPNM"), col("vintage"))
        .orderBy("CCGCDH")
    }),

    // 1c — provider -> MSOA -> deprivation/region: the geocode
    // enrichment (S6, deterministic portable client) feeds the
    // point-in-polygon join (J7) against a 2x2 quadrant MSOA grid
    // (edges offset 0.005 so no geocoded point — always a multiple of
    // 0.01 — can land on one), then the MSOA attribute join. The
    // oracle recomputes the geocode arithmetic and the quadrant
    // assignment as range predicates.
    "q_lkp_provider_region" -> ((s, d) => {
      import s.implicits._
      val reqs = Tables.supplier(s, d).select(
          col("s_suppkey").cast("string").as("code"),
          col("s_name").as("postcode"),
          lit("prov").as("name"))
        .as[Geocoder.GeocodeRequest](
          org.apache.spark.sql.Encoders.product[Geocoder.GeocodeRequest])
      val locs = Geocoder.geocode(reqs, new Geocoder.PortableFakeClient())
        .toDF()
        .select(col("code").cast("bigint").as("code"), col("lat"),
          col("lon").as("long"))
      val polys = Seq(
        ("M1", Seq(-5.005, -0.005, -0.005, -5.005),
          Seq(49.995, 49.995, 54.995, 54.995)),
        ("M2", Seq(-0.005, 4.995, 4.995, -0.005),
          Seq(49.995, 49.995, 54.995, 54.995)),
        ("M3", Seq(-5.005, -0.005, -0.005, -5.005),
          Seq(54.995, 54.995, 59.995, 59.995)),
        ("M4", Seq(-0.005, 4.995, 4.995, -0.005),
          Seq(54.995, 54.995, 59.995, 59.995)))
        .toDF("msoa11cd", "xs", "ys")
        .select(col("msoa11cd"), Spatial.polygon(col("xs"), col("ys")).as("poly"))
      val msoaImd = Seq(("M1", 1, "North"), ("M2", 2, "North"),
        ("M3", 3, "South"), ("M4", 4, "South"))
        .toDF("msoa11cd", "IMD19_decile", "region")
      Lookups.providerToImdRegion(locs, polys, msoaImd)
        .select(col("code"), col("msoa11cd"), col("IMD19_decile"),
          col("region"))
        .orderBy("code")
    }))

  val oracles: Map[String, String] = Map(
    "q_lkp_imd_ccg" ->
      """WITH l AS (
        |  SELECT 'CCG' || c_nationkey AS CCGCDH, floor(c_acctbal) AS score,
        |    c_custkey % 97 + 1 AS pop
        |  FROM customer),
        |a AS (
        |  SELECT CCGCDH, sum(score * pop) / sum(pop) AS IMD19_score
        |  FROM l GROUP BY CCGCDH)
        |SELECT CCGCDH, round(IMD19_score, 6) AS imd_score,
        |  CAST(11 - ntile(10) OVER (ORDER BY IMD19_score, CCGCDH) AS INT)
        |    AS IMD19_decile,
        |  CAST(6 - ntile(5) OVER (ORDER BY IMD19_score, CCGCDH) AS INT)
        |    AS IMD19_quintile
        |FROM a ORDER BY CCGCDH""".stripMargin,
    "q_lkp_vintage_union" ->
      """WITH v21 AS (
        |  SELECT 'CCG' || n_nationkey AS CCGCDH, 'R' || n_regionkey AS NHSERNM,
        |    'STP' || n_nationkey AS STPNM, '2021' AS vintage
        |  FROM nation WHERE n_nationkey % 2 = 0),
        |v18 AS (
        |  SELECT 'CCG' || n_nationkey, 'OLD' || n_regionkey, NULL, '2018'
        |  FROM nation),
        |u AS (SELECT * FROM v21 UNION ALL SELECT * FROM v18)
        |SELECT CCGCDH, NHSERNM, STPNM, vintage FROM (
        |  SELECT *, row_number() OVER (PARTITION BY CCGCDH
        |    ORDER BY vintage DESC) AS rn FROM u) t
        |WHERE rn = 1 ORDER BY CCGCDH""".stripMargin,
    "q_lkp_provider_region" ->
      """WITH s0 AS (
        |  SELECT s_suppkey AS code,
        |    list_reduce(list_transform(range(length(s_name)),
        |        i -> CAST(ascii(substr(s_name, CAST(i + 1 AS INT), 1)) AS BIGINT)),
        |      (a, b) -> a + b) AS cs
        |  FROM supplier),
        |p AS (
        |  SELECT code, 50.0 + (cs % 1000) / 100.0 AS lat,
        |    -5.0 + ((cs // 7) % 1000) / 100.0 AS long
        |  FROM s0),
        |j AS (
        |  SELECT code,
        |    CASE WHEN lat < 54.995 AND long < -0.005 THEN 'M1'
        |         WHEN lat < 54.995 THEN 'M2'
        |         WHEN long < -0.005 THEN 'M3'
        |         ELSE 'M4' END AS msoa11cd
        |  FROM p)
        |SELECT code, msoa11cd,
        |  CAST(CASE msoa11cd WHEN 'M1' THEN 1 WHEN 'M2' THEN 2
        |       WHEN 'M3' THEN 3 ELSE 4 END AS INT) AS IMD19_decile,
        |  CASE WHEN msoa11cd IN ('M1', 'M2') THEN 'North' ELSE 'South' END
        |    AS region
        |FROM j ORDER BY code""".stripMargin)
}
