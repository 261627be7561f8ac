package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.{Geocoder => Ingest0, Ingest}
import graft.spatial.Spatial

/** Source/sink + spatial operator queries: CSV scan round-trips
  * (S1/S2/K1), min_by-style first() (A4), positional union (U2), and
  * the point-in-polygon join (J7). Oracles run on the original parquet
  * — the CSV leg is the Spark-side subject under test.
  */
object SourceQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def tmpDir(tag: String): String =
    graft.util.TempDirs.scoped(s"graft-$tag").toString

  val defs: Map[String, Q] = Map(
    // S1+K1 — write header CSV (mangled-style names), read back with
    // the fread-shim, aggregate. Values must survive the text
    // round-trip bit-exactly (Spark prints shortest round-trip doubles).
    "q_s1_csv_roundtrip" -> ((s, d) => {
      val out = tmpDir("s1") + "/li"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice").as("l extended price"), // mangle target
          col("l_returnflag"))
        .write.option("header", "true").mode("overwrite").csv(out)
      // explicit schema: inferSchema would re-scan the whole CSV (r1
      // bench: 3 passes for this query)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("l_quantity", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("l extended price", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("l_returnflag", org.apache.spark.sql.types.StringType)))
      Ingest.csvMangledNames(s, out, Some(schema))
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("`l.extended.price`"), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // S2 — headerless CSV, positional V-column selection.
    "q_s2_headerless_csv" -> ((s, d) => {
      val out = tmpDir("s2") + "/nation"
      Tables.nation(s, d).orderBy("n_nationkey")
        .write.option("header", "false").mode("overwrite").csv(out)
      Ingest.headerlessCsv(s, out, Map(1 -> "nkey", 2 -> "nname", 3 -> "rkey"))
        .select(col("nkey").cast("bigint").as("nkey"), col("nname"),
          col("rkey").cast("bigint").as("rkey"))
        .orderBy("nkey")
    }),

    // S6 — REST geocode enrichment through the real mapPartitions
    // pipeline (partition-local client, per-row error capture), with
    // the SQL-portable deterministic client so the whole path sits
    // under the hash-match gate. Every 50th key gets an empty postcode
    // to exercise the ZERO_RESULTS arm.
    "q_s6_geocode" -> ((s, d) => {
      val reqs = Tables.customer(s, d)
        .select(
          col("c_custkey").cast("string").as("code"),
          when(col("c_custkey") % 50 === 0, lit("")).otherwise(col("c_name"))
            .as("postcode"),
          col("c_mktsegment").as("name"))
        .as[Ingest0.GeocodeRequest](
          org.apache.spark.sql.Encoders.product[Ingest0.GeocodeRequest])
      Ingest0.geocode(reqs, new Ingest0.PortableFakeClient())
        .toDF()
        .select(col("code").cast("bigint").as("code"), col("postcode"),
          col("status"), col("number_results").cast("bigint").as("number_results"),
          when(isnan(col("lat")), lit(null)).otherwise(col("lat")).as("lat"),
          when(isnan(col("lon")), lit(null)).otherwise(col("lon")).as("lon"),
          col("address"))
        .orderBy("code")
    }),

    // K2 — partitioned parquet sink with DYNAMIC partition overwrite:
    // write orders partitioned by priority, then re-ingest ONE
    // partition with corrected keys. Dynamic mode must replace exactly
    // that partition (not double it) and leave the others untouched —
    // the reference's idempotent monthly re-ingest (`1b.:169-179`).
    // The read-back aggregate hash-checks both properties.
    "q_k2_partition_overwrite" -> ((s, d) => {
      val out = tmpDir("k2") + "/orders"
      val orders = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      Ingest.writePartitioned(orders, out, "o_orderpriority")
      Ingest.writePartitioned(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .withColumn("o_custkey", col("o_custkey") + 1000000L),
        out, "o_orderpriority")
      s.read.parquet(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_custkey").as("sum_cust"))
        .orderBy("o_orderpriority")
    }),

    // A4 — deterministic first(): min_by with a pinned order column.
    "q_a4_first_per_group" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(min("c_custkey").as("first_key"),
          min_by(col("c_name"), col("c_custkey")).as("first_name"))
        .orderBy("c_nationkey")
    }),

    // U2 — positional union.
    "q_u2_union_positional" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey").as("k"), col("c_name").as("nm"))
        .union(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")))
        .orderBy("nm")
    }),

    // J7 — point-in-polygon join: customers as points on a 10x10 grid
    // (offset 0.05 so nothing lands on a polygon edge), three literal
    // polygons incl. a triangle (non-rectangular, exercises the real
    // ray cast) and two overlapping rectangles (multi-match).
    "q_j7_point_in_polygon" -> ((s, d) => {
      import s.implicits._
      val polys = Seq(
        ("A", Seq(0.0, 5.0, 5.0, 0.0), Seq(0.0, 0.0, 5.0, 5.0)),
        ("B", Seq(4.0, 9.0, 9.0, 4.0), Seq(4.0, 4.0, 9.0, 9.0)),
        // half-integer triangle vertices: no 0.05-offset grid point can
        // land exactly on an edge (parity argument), so the strict
        // inequalities below agree with ray casting on every point
        ("T", Seq(0.5, 8.5, 2.5), Seq(6.0, 6.0, 9.0)))
        .toDF("poly_id", "xs", "ys")
        .select(col("poly_id"), Spatial.polygon(col("xs"), col("ys")).as("poly"))
      val points = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_custkey") % 100).cast("double") / 10.0 + 0.05,
        (col("c_custkey") % 83).cast("double") / 10.0 + 0.05)
        .toDF("c_custkey", "px", "py")
      Spatial.pointInPolygonJoin(points, polys, "px", "py", "poly")
        .select("c_custkey", "poly_id")
        .orderBy("c_custkey", "poly_id")
    }))

  val oracles: Map[String, String] = Map(
    "q_s1_csv_roundtrip" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_s2_headerless_csv" ->
      """SELECT n_nationkey AS nkey, n_name AS nname, n_regionkey AS rkey
        |FROM nation ORDER BY nkey""".stripMargin,
    "q_k2_partition_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_custkey + CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN 1000000 ELSE 0 END) AS BIGINT) AS sum_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_s6_geocode" ->
      """WITH c AS (
        |  SELECT c_custkey AS code,
        |    CASE WHEN c_custkey % 50 = 0 THEN '' ELSE c_name END AS postcode,
        |    c_mktsegment AS name
        |  FROM customer),
        |s AS (
        |  SELECT code, postcode, name,
        |    CASE WHEN length(trim(postcode)) = 0 THEN NULL
        |      ELSE list_reduce(list_transform(range(length(postcode)),
        |          i -> CAST(ascii(substr(postcode, CAST(i + 1 AS INT), 1)) AS BIGINT)),
        |        (a, b) -> a + b) END AS cs
        |  FROM c)
        |SELECT code, postcode,
        |  CASE WHEN cs IS NULL THEN 'ZERO_RESULTS' ELSE 'OK' END AS status,
        |  CASE WHEN cs IS NULL THEN 0 ELSE 1 END AS number_results,
        |  CASE WHEN cs IS NULL THEN NULL
        |       ELSE 50.0 + (cs % 1000) / 100.0 END AS lat,
        |  CASE WHEN cs IS NULL THEN NULL
        |       ELSE -5.0 + ((cs // 7) % 1000) / 100.0 END AS lon,
        |  CASE WHEN cs IS NULL THEN NULL ELSE name || ', ' || postcode END AS address
        |FROM s ORDER BY code""".stripMargin,
    "q_a4_first_per_group" ->
      """SELECT c_nationkey, min(c_custkey) AS first_key,
        |  min_by(c_name, c_custkey) AS first_name
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_u2_union_positional" ->
      """SELECT c_custkey AS k, c_name AS nm FROM customer
        |UNION ALL SELECT s_suppkey, s_name FROM supplier
        |ORDER BY nm""".stripMargin,
    "q_j7_point_in_polygon" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    (c_custkey % 100) / 10.0 + 0.05 AS px,
        |    (c_custkey % 83) / 10.0 + 0.05 AS py
        |  FROM customer)
        |SELECT c_custkey, poly_id FROM (
        |  SELECT c_custkey, 'A' AS poly_id FROM p
        |    WHERE px > 0 AND px < 5 AND py > 0 AND py < 5
        |  UNION ALL
        |  SELECT c_custkey, 'B' FROM p
        |    WHERE px > 4 AND px < 9 AND py > 4 AND py < 9
        |  UNION ALL
        |  SELECT c_custkey, 'T' FROM p
        |    WHERE py > 6 AND px + 2 * py < 20.5 AND 3 * px - 2 * py > -10.5) t
        |ORDER BY c_custkey, poly_id""".stripMargin)
}
