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
    * underscores survive).
    *
    * Explicit `schema` is the default contract; without one the columns
    * come back as STRINGS (cast downstream). `inferSchema = true` is
    * the opt-in exception — inference is a SECOND full scan of every
    * CSV, which at monthly-extract scale doubles ingest cost.
    *
    * BREAKING (round 2): the no-schema default flipped from
    * `inferSchema=true` to all-string columns; callers relying on the
    * old inferred types must now pass `inferSchema = true`. */
  def csvMangledNames(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      inferSchema: Boolean = false): DataFrame = {
    val base = spark.read.option("header", "true")
    val df = schema.map(base.schema).getOrElse(
      if (inferSchema) base.option("inferSchema", "true") else base)
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
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String = "monthyr"): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** K1 — single-file CSV sink (reference export shape, `1b.:392`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)

  /** S5 step 1 — anchors out of raw HTML: one row per `<a>` tag with
    * its page position, link text, and href (the offline equivalent of
    * the reference's `html_nodes(xpath)` pull, `1b.:105-116`). Pure
    * expression work (two regexp_extract_all passes zipped), so a
    * million saved pages scan in parallel like any other table.
    * Expects `df(htmlCol)` to hold a page per row plus any id columns
    * the caller wants carried through. */
  def anchorLinks(df: DataFrame, htmlCol: String): DataFrame = {
    val anchor = "(?s)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    df.withColumn("__a", arrays_zip(
        regexp_extract_all(col(htmlCol), lit(anchor), lit(1)).as("href"),
        regexp_extract_all(col(htmlCol), lit(anchor), lit(2)).as("text")))
      .select(col("*"), posexplode(col("__a")).as(Seq("pos", "__e")))
      .select(df.columns.filter(_ != htmlCol).map(col) ++ Seq(
        col("pos").cast("bigint").as("pos"),
        col("__e.text").as("text"), col("__e.href").as("href")): _*)
  }

  /** S5 step 2 — `return_links_rtt` (`1b.:83-138`) as a pure
    * links-in/classified-out function: for each (month, series) pick
    * the FIRST link (page order) whose text mentions the month and
    * whose href matches each of the five series patterns. No month
    * match -> null column, exactly like R's `links[str_detect(...)][1]`
    * yielding NA.
    *
    * `cal` is the (month, series) calendar ([[graft.schema.Dimensions
    * .scrapeCalendar]]); `pages` is one anchor table per series —
    * (series, pos, text, href), from [[anchorLinks]] over saved landing
    * pages. One broadcast join + one aggregation; first-match is
    * `min_by` over page position (null patterns skipped by min_by).
    *
    * Deliberate fix vs the reference: its `Admitted-Provider` pattern
    * (`1b.:122`) also matches `NonAdmitted-Provider` links, silently
    * relying on page order; here a lookbehind keeps the two series
    * disjoint. */
  def returnLinksRtt(cal: DataFrame, pages: DataFrame): DataFrame = {
    val monthLinks = broadcast(cal).join(pages, Seq("series"))
      .filter(col("text").contains(col("month")))
    def firstMatch(pattern: String, out: String) =
      min_by(when(col("href").rlike(pattern), col("href")),
        when(col("href").rlike(pattern), col("pos"))).as(out)
    val classified = monthLinks.groupBy("month", "series").agg(
      firstMatch("Full-CSV|full-extract", "full_csv_link"),
      firstMatch("Incomplete-Provider", "providers_link_incomp"),
      firstMatch("New-Periods-Provider", "providers_link_new"),
      firstMatch("(?<!Non)Admitted-Provider", "providers_link_adm"),
      firstMatch("NonAdmitted-Provider", "providers_link_nonadm"))
    // months with NO matching anchors (not yet published) must still
    // come back as an all-null row — R's NA row, not a missing row
    cal.join(classified, Seq("month", "series"), "left")
  }
}
