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

    // S1c — malformed-row quarantine: PERMISSIVE parse with the
    // corrupt-record capture column, the production answer to "the
    // 100 TB CSV drop has broken lines in it". DROPMALFORMED silently
    // loses data and FAILFAST kills the whole job for one bad line;
    // PERMISSIVE + _corrupt_record keeps every byte — good rows parse,
    // bad rows land null-padded with the raw line preserved for a
    // quarantine sink — in ONE pass with no driver involvement. The
    // fixture plants a non-numeric value in a numeric column on every
    // 5th nation row; the oracle restates good/bad aggregates from the
    // original parquet, so the gate proves bad rows are EXACTLY the
    // planted ones and good rows parse bit-exactly.
    "q_s1_bad_records" -> ((s, d) => {
      val out = tmpDir("badrec") + "/nation"
      Tables.nation(s, d)
        .select(when(col("n_nationkey") % 5 === 2,
            concat_ws(",", col("n_nationkey"), col("n_name"),
              lit("not-a-number")))
          .otherwise(concat_ws(",", col("n_nationkey"), col("n_name"),
            col("n_regionkey"))).as("value"))
        .write.mode("overwrite").text(out)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("nkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("nname", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
            .as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_bad"),
          sum(when(col("_corrupt_record").isNull, col("rkey")))
            .cast("bigint").as("sum_rkey"),
          countDistinct(when(col("_corrupt_record").isNull, col("nname")))
            .as("n_names"))
    }),

    // S8b — JSONL (newline-delimited JSON) round-trip: THE interchange
    // format of LLM training corpora (every public text dump ships as
    // *.jsonl.zst). Write the documents table as JSONL, read it back
    // with an EXPLICIT schema — at 100 TB, schema inference is a full
    // extra pass over the corpus before the first real job — and prove
    // the text column survived JSON escaping (quotes, newlines,
    // unicode) bit-exactly via per-source md5 extremes against the
    // original parquet.
    "q_jsonl_roundtrip" -> ((s, d) => {
      val out = tmpDir("jsonl") + "/docs"
      Tables.documents(s, d).write.mode("overwrite").json(out)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      s.read.schema(schema).json(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"))
        .orderBy("source")
    }),

    // S8c — parquet schema evolution across drops: a corpus ingested
    // over years has early drops missing columns that later drops
    // carry (the `lang` column here). Reading the whole lake with the
    // UNIFIED explicit schema null-fills the missing column per
    // row-group natively — no mergeSchema footer scan over every file
    // (an extra listing+footer pass at 100 TB), no rewrite of old
    // drops, no driver involvement. The oracle restates the aggregates
    // from the original table with lang nulled for the old-drop rows.
    "q_s8_schema_evolution" -> ((s, d) => {
      val out = tmpDir("schevo")
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 3 === 0)
        .select("doc_id", "text", "source", "n_chars") // old drop: no lang
        .write.mode("overwrite").parquet(out + "/drop=old")
      docs.filter(col("doc_id") % 3 =!= 0)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(out + "/drop=new")
      val unified = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      s.read.schema(unified).parquet(out + "/drop=old", out + "/drop=new")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(col("lang")).as("n_with_lang"),
          countDistinct(col("lang")).as("n_langs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"))
        .orderBy("source")
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

    // Bucketed co-located fact-to-fact join THROUGH THE GATE: both
    // sides written bucketed on the join key, then joined with
    // broadcast disabled — the contract booleans pin that the join
    // plan has NO Exchange on either side and reads bucket-aware
    // scans (the 100 TB repeated-join payoff ScaleOpsSpec asserts;
    // here the driver gate sees it too). Values oracle = the plain
    // join restated in DuckDB: bucketing must be value-invisible.
    "q_scale_bucketed" -> ((s, d) => {
      // DROP alone is not enough: a FRESH JVM's derby metastore has no
      // table entry, but the warehouse LOCATION from a previous run
      // persists on disk and saveAsTable refuses to reuse it
      // (LOCATION_ALREADY_EXISTS) — clear both, like ScaleOpsSpec
      Seq("g_li_bkt", "g_or_bkt").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + "/" + t)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      graft.ops.ScaleOps.writeBucketed(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        "g_li_bkt", "l_orderkey", 8)
      graft.ops.ScaleOps.writeBucketed(
        Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        "g_or_bkt", "l_orderkey", 8)
      def joined = s.table("g_li_bkt").join(s.table("g_or_bkt"), "l_orderkey")
      // plan shape probed under the no-broadcast regime the tables
      // would face at fact-to-fact scale; values computed normally
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val (noExchange, bucketScan) =
        try {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val plan = joined.queryExecution.executedPlan.toString
          (!plan.contains("Exchange"), plan.contains("Bucketed: true"))
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum("l_orderkey").as("sum_keys"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .withColumn("no_exchange", lit(noExchange))
        .withColumn("bucket_scan", lit(bucketScan))
        .orderBy("o_orderpriority")
    }),

    // S8d — ORC scan + sink: the other columnar lake format (some
    // upstream estates publish ORC; an engine that only reads its own
    // parquet can't ingest them). Same explicit-schema discipline as
    // the parquet/JSONL legs; text byte-exactness proven through the
    // roundtrip by per-text md5 distincts. DuckDB cannot read ORC, so
    // the oracle restates the aggregates from the original table —
    // the roundtrip must be value-invisible, exactly the
    // q_jsonl_roundtrip contract.
    "q_s8_orc_roundtrip" -> ((s, d) => {
      val out = tmpDir("orc")
      Tables.documents(s, d).write.mode("overwrite").orc(out + "/docs")
      s.read.schema(Tables.documents(s, d).schema).orc(out + "/docs")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"))
        .orderBy("source")
    }),

    // K4 — small-files compaction: a per-drop sink leaves the lake as
    // 64 KB-sized fragments (staged here by a repartition(64) write);
    // ScaleOps.compactPath rewrites at ceil(bytes/target) files.
    // The gate proves content invariance through the rewrite (count,
    // id sum, and per-text md5 distinct per source) plus the
    // compaction contract itself (fewer files, exactly the computed
    // count — booleans the oracle states as literals).
    "q_k4_compaction" -> ((s, d) => {
      val out = tmpDir("k4")
      val docs = Tables.documents(s, d)
      docs.repartition(64).write.mode("overwrite")
        .parquet(out + "/fragmented")
      val nAfter = graft.ops.ScaleOps.compactPath(s, out + "/fragmented",
        out + "/compacted", targetBytes = 64L * 1024 * 1024)
      val fs = new org.apache.hadoop.fs.Path(out + "/compacted")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(out + "/compacted"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      s.read.parquet(out + "/compacted")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("sum_ids"),
          countDistinct(md5(col("text"))).as("n_texts"))
        .withColumn("fewer_files", lit(files < 64))
        .withColumn("file_count_as_computed", lit(files == nAfter))
        .orderBy("source")
    }),

    // K5 — Z-ORDER clustered layout (the OPTIMIZE ZORDER primitive):
    // lineitem rewritten clustered on the Morton interleave of two
    // bucketed dimensions, then queried with a range predicate on
    // BOTH. The layout must be value-invisible — the oracle restates
    // the filter+aggregate from the original table, so the gate result
    // is purely data-derived. The PLAN contracts (both range
    // predicates reach the parquet scan as PushedFilters; per-file
    // envelopes a fraction of the global range) live in LayoutSpec:
    // baking explain-string literals into a gate result would flip the
    // query to failing on a PushedFilters rendering change even with
    // correct data.
    "q_layout_zorder" -> ((s, d) => {
      val out = tmpDir("zorder") + "/li"
      val li = Tables.lineitem(s, d).select(
        pmod(col("l_orderkey"), lit(256)).as("zx"),
        pmod(col("l_partkey"), lit(256)).as("zy"),
        col("l_quantity"))
      graft.ops.Layout.clusteredWrite(li, out,
        graft.ops.Layout.zorderValue(Seq(col("zx"), col("zy")), 8),
        numFiles = 16)
      s.read.parquet(out)
        .filter(col("zx").between(16, 47) && col("zy").between(64, 95))
        .groupBy("zx")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum("zy").as("sum_zy"))
        .orderBy("zx")
    }),

    // K6 — keyed MERGE (upsert) by partition-scoped rewrite: orders
    // staged partitioned by month, then one year's revision batch
    // (updated prices for key%7, inserted keys for key%13) merged in.
    // Updates override, inserts land, every other month is never read
    // or rewritten — and the full-table read-back aggregate the
    // oracle restates proves the untouched months survived
    // bit-exactly alongside the merged ones.
    "q_k5_merge_upsert" -> ((s, d) => {
      val out = tmpDir("k5") + "/orders"
      def withShape(df: DataFrame): DataFrame = df.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        bround(col("o_totalprice") * lit(100.0), 0).cast("bigint")
          .as("price_c"),
        lit(0L).as("version"))
      withShape(Tables.orders(s, d))
        // co-located partitioned write — see MergeUpsert.mergeByKey
        .repartition(col("month"))
        .write.mode("overwrite").partitionBy("month").parquet(out)
      val base95 = withShape(Tables.orders(s, d))
        .filter(col("month").startsWith("1995"))
      val updates = base95.filter(col("o_orderkey") % 7 === 0)
          .withColumn("price_c", col("price_c") + 100000L)
          .withColumn("version", lit(1L))
        .unionByName(base95.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("version", lit(1L)))
      graft.ops.MergeUpsert.mergeByKey(s, out, updates,
        keyCols = Seq("o_orderkey"), versionCol = "version",
        partitionCol = "month")
      s.read.parquet(out)
        .groupBy("month")
        .agg(count(lit(1)).as("n"),
          sum("price_c").as("sum_price_c"),
          sum("version").as("n_revised"))
        .orderBy("month")
    }),

    // S3+S4 — the monthly WORKBOOK DROP chain end-to-end: supplier is
    // published as a zip-wrapped .xlsx (SheetWrite: title row + blank
    // row + header, trailing Notes sheet — the reference workbooks'
    // shape, `1b.:242-260`), then ingested back through the real
    // pipeline: unzip (S4, zip-slip-guarded) -> named-sheet xlsx->CSV
    // conversion with skipRows (S3) -> S1 mangled-name CSV reader.
    // The oracle reads the original parquet: the whole staged
    // spreadsheet round-trip must be value-invisible (doubles survive
    // via shortest-round-trip rendering). Fixture staging is driver-
    // side BY CONTRACT — one monthly workbook is one small file;
    // supplier is dimension-sized.
    "q_s3_xlsx_ingest" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.util.TempDirs.scoped("graft-s3x")
      val rows = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
        .orderBy("s_suppkey").collect()
      val sheet = Seq(
        Seq("Incomplete Provider monthly extract"), Seq.empty[String],
        Seq("Provider Code", "Provider Name", "Region Code", "Acct Balance")) ++
        rows.map(r => Seq(r.getLong(0).toString, r.getString(1),
          r.getInt(2).toString, r.getDouble(3).toString))
      val xlsx = dir.resolve("Incomplete-Provider-Jul21.xlsx")
      graft.tools.SheetWrite.xlsx(xlsx.toString,
        Seq("IS Provider" -> sheet, "Notes" -> Seq(Seq("footnotes"))))
      val zip = dir.resolve("Incomplete-Provider-Jul21.zip")
      graft.tools.SheetWrite.zip(zip.toString,
        Seq("Incomplete-Provider-Jul21.xlsx" -> xlsx))
      val extracted = graft.tools.ExcelConvert.unzip(
        zip.toString, dir.resolve("unzipped").toString)
      val csv = dir.resolve("extract.csv").toString
      graft.tools.ExcelConvert.xlsxToCsv(
        extracted.find(_.endsWith(".xlsx")).get, csv, "IS Provider",
        skipRows = 2)
      val schema = StructType(Seq(
        StructField("Provider Code", LongType),
        StructField("Provider Name", StringType),
        StructField("Region Code", LongType),
        StructField("Acct Balance", DoubleType)))
      Ingest.csvMangledNames(s, csv, Some(schema))
        .select(col("`Provider.Code`").as("code"),
          col("`Provider.Name`").as("name"),
          col("`Region.Code`").as("region"),
          col("`Acct.Balance`").as("balance"))
        .orderBy("code")
    }),

    // S3 (ODS leg) — same chain for an OpenDocument drop: nation
    // published as .ods (title + blank gap + header), converted via
    // the ODS reader's repeat-run/grid-padding handling, read back
    // through S1. Oracle on the original parquet.
    "q_s3_ods_ingest" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.util.TempDirs.scoped("graft-s3o")
      val rows = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy("n_nationkey").collect()
      val sheet = Seq(
        Seq("Org reference"), Seq.empty[String],
        Seq("Org Code", "Org Name", "Region Code")) ++
        rows.map(r => Seq(r.getInt(0).toString, r.getString(1),
          r.getInt(2).toString))
      val ods = dir.resolve("org-ref.ods")
      graft.tools.SheetWrite.ods(ods.toString,
        Seq("Notes" -> Seq(Seq("skip")), "IS Provider" -> sheet))
      val csv = dir.resolve("org-ref.csv").toString
      graft.tools.ExcelConvert.odsToCsv(ods.toString, csv, "IS Provider",
        skipRows = 2)
      val schema = StructType(Seq(
        StructField("Org Code", LongType),
        StructField("Org Name", StringType),
        StructField("Region Code", LongType)))
      Ingest.csvMangledNames(s, csv, Some(schema))
        .select(col("`Org.Code`").as("code"), col("`Org.Name`").as("name"),
          col("`Region.Code`").as("region"))
        .orderBy("code")
    }),

    // S5 — the landing-page SCRAPE chain through the gate: one HTML
    // page per month is BUILT IN SPARK from the orders calendar (one
    // anchor per published series; even-keyed months omit the New-
    // Periods file and a NonAdmitted decoy guards the lookbehind),
    // then anchorLinks pulls the anchor table and return_links_rtt
    // classifies first-matches per (month, series). Links are
    // deterministic functions of the month string, so the DuckDB
    // oracle restates them directly from orders — the HTML leg must
    // be value-invisible.
    "q_s5_scrape_links" -> ((s, d) => {
      // cached: dimension-sized (one row per published month) but
      // derived from a fact scan — the page build, the broadcast cal
      // of returnLinksRtt's join, AND its final left join each replay
      // the 150k-row distinct otherwise (measured 9.8s -> 0.8s at
      // sf0.1; at 100 TB the recomputation would be a corpus re-scan
      // per consumer)
      val months = Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "MMMyy").as("month"),
          (month(col("o_orderdate")) % 2).as("evenm"))
        .distinct().cache()
      val pages = months.select(lit("rtt").as("series"), concat(
          lit("<html><body><p>RTT waiting times data</p>"),
          lit("<a href=\"/x/full-extract-"), col("month"),
          lit(".zip\">Full CSV data file "), col("month"), lit("</a>"),
          lit("<a href=\"/x/NonAdmitted-Provider-"), col("month"),
          lit(".xls\">NonAdmitted Provider "), col("month"), lit("</a>"),
          lit("<a href=\"/x/Admitted-Provider-"), col("month"),
          lit(".xls\">Admitted Provider "), col("month"), lit("</a>"),
          when(col("evenm") === 0,
            concat(lit("<a href=\"/x/New-Periods-Provider-"), col("month"),
              lit(".xls\">New Periods Provider "), col("month"), lit("</a>")))
            .otherwise(lit("")),
          lit("<a href=\"/x/Incomplete-Provider-"), col("month"),
          lit(".xls\">Incomplete Provider "), col("month"), lit("</a>"),
          lit("</body></html>")).as("page"))
      val cal = months.select(col("month"), lit("rtt").as("series"))
      Ingest.returnLinksRtt(cal,
          Ingest.anchorLinks(pages, "page"))
        .orderBy("month")
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
    // restated over the original parquet: bad rows are exactly the
    // planted ones, good-row aggregates match the unmangled source
    "q_s1_bad_records" ->
      """SELECT
        |  CAST(sum(CASE WHEN n_nationkey % 5 <> 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN n_nationkey % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  CAST(sum(CASE WHEN n_nationkey % 5 <> 2 THEN n_regionkey END) AS BIGINT) AS sum_rkey,
        |  count(DISTINCT CASE WHEN n_nationkey % 5 <> 2 THEN n_name END) AS n_names
        |FROM nation""".stripMargin,
    // restated over the original table with lang nulled on the
    // old-drop rows — proves the schema-evolved read null-fills
    // exactly the missing column and nothing else
    "q_s8_schema_evolution" ->
      """SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 3 <> 0 THEN lang END) AS n_with_lang,
        |  count(DISTINCT CASE WHEN doc_id % 3 <> 0 THEN lang END) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS n_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // restated over the original parquet: identical aggregates prove
    // the JSONL leg neither lost nor altered a single text byte
    "q_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS n_texts,
        |  min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_k2_partition_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(o_custkey + CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN 1000000 ELSE 0 END) AS BIGINT) AS sum_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // bucketing is value-invisible; the plan-shape contract booleans
    // are literals
    "q_scale_bucketed" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        |  CAST(sum(l.l_orderkey) AS BIGINT) AS sum_keys,
        |  count(DISTINCT l.l_orderkey) AS n_orders,
        |  TRUE AS no_exchange, TRUE AS bucket_scan
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    // the clustered layout is value-invisible: the oracle filters and
    // aggregates the original table (pushdown contract in LayoutSpec)
    "q_layout_zorder" ->
      """WITH z AS (
        |  SELECT l_orderkey % 256 AS zx, l_partkey % 256 AS zy, l_quantity
        |  FROM lineitem)
        |SELECT zx, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(zy) AS BIGINT) AS sum_zy
        |FROM z WHERE zx BETWEEN 16 AND 47 AND zy BETWEEN 64 AND 95
        |GROUP BY zx ORDER BY zx""".stripMargin,
    // the merge must reproduce exactly the keep-latest state the SQL
    // computes from scratch — updated months and untouched months both
    "q_k5_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(round_even(o_totalprice * 100.0, 0) AS BIGINT) AS price_c,
        |    0 AS version
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, month, price_c + 100000 AS price_c, 1 AS version
        |  FROM base WHERE o_orderkey % 7 = 0 AND month LIKE '1995%'
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, month, price_c, 1
        |  FROM base WHERE o_orderkey % 13 = 0 AND month LIKE '1995%'),
        |merged AS (
        |  SELECT o_orderkey, month, price_c, version FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY version DESC) AS rn
        |    FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        |  WHERE rn = 1)
        |SELECT month, count(*) AS n,
        |  CAST(sum(price_c) AS BIGINT) AS sum_price_c,
        |  CAST(sum(version) AS BIGINT) AS n_revised
        |FROM merged GROUP BY month ORDER BY month""".stripMargin,
    // ORC roundtrip is value-invisible (DuckDB has no ORC reader; the
    // jsonl-roundtrip contract oracle)
    "q_s8_orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS n_texts,
        |  min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // compaction is value-invisible: the aggregates come straight from
    // the original table, and the contract booleans are literals
    "q_k4_compaction" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  count(DISTINCT md5(text)) AS n_texts,
        |  TRUE AS fewer_files, TRUE AS file_count_as_computed
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
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
    "q_s3_xlsx_ingest" ->
      """SELECT s_suppkey AS code, s_name AS name,
        |  CAST(s_nationkey AS BIGINT) AS region, s_acctbal AS balance
        |FROM supplier ORDER BY code""".stripMargin,
    "q_s3_ods_ingest" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS code, n_name AS name,
        |  CAST(n_regionkey AS BIGINT) AS region
        |FROM nation ORDER BY code""".stripMargin,
    "q_s5_scrape_links" ->
      """WITH m AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%b%y') AS month,
        |    month(o_orderdate) % 2 AS evenm
        |  FROM orders)
        |SELECT month, 'rtt' AS series,
        |  '/x/full-extract-' || month || '.zip' AS full_csv_link,
        |  '/x/Incomplete-Provider-' || month || '.xls' AS providers_link_incomp,
        |  CASE WHEN evenm = 0
        |    THEN '/x/New-Periods-Provider-' || month || '.xls' END
        |    AS providers_link_new,
        |  '/x/Admitted-Provider-' || month || '.xls' AS providers_link_adm,
        |  '/x/NonAdmitted-Provider-' || month || '.xls' AS providers_link_nonadm
        |FROM m ORDER BY month""".stripMargin,
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
