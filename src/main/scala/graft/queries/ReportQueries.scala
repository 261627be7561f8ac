package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Report-layer queries: the 3d new-RTT:completed ratio (multi-key
  * join + monthyr date parsing) and the remaining §2.9 scalar-function
  * inventory (initcap/word/nested-ifelse/NA-to-0).
  */
object ReportQueries {
  private type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // 3d. Ratio.R:95-123 — per (month, group, IS slice): newRTT volume
    // vs completed volume, inner-joined on the multi-column key (J3),
    // plus a summed "Total" slice (U2), ratio, and the reference's
    // '01-MMM-yy' date reconstruction from the monthyr tag (§2.9 dates;
    // 4-digit years here — Spark's 'yy' pivots to 2000-2099 while DuckDB's
    // '%y' pivots at 1969, so 2-digit parses diverge before 2000).
    "q_ratio_new_to_completed" -> ((s, d) => {
      val f0 = Tables.lineitem(s, d).select(
        concat(date_format(col("l_shipdate"), "MMM"),
          date_format(col("l_shipdate"), "yyyy")).as("monthyr"),
        col("l_linestatus").as("grp"),
        when(col("l_discount") > 0.05, "IS").otherwise("Non-IS").as("is_slice"),
        when(col("l_returnflag") === "R", "newRTT")
          .when(col("l_returnflag") === "N", "completed")
          .otherwise("other").as("pathway"),
        col("l_quantity"))
      // cached: the Total-slice reagg + union would otherwise replay
      // the fact aggregation twice
      val base = f0.groupBy("monthyr", "grp", "is_slice", "pathway")
        .agg(sum("l_quantity").as("n")).cache()
      val slices = base
        .groupBy("monthyr", "grp", "pathway")
        .agg(sum("n").as("n")).withColumn("is_slice", lit("Total"))
        .unionByName(base)
      val newRtt = slices.filter(col("pathway") === "newRTT")
        .select(col("monthyr"), col("grp"), col("is_slice"), col("n").as("n_new"))
      val fin = slices.filter(col("pathway") === "completed")
        .select(col("monthyr"), col("grp"), col("is_slice"), col("n").as("n_fin"))
      newRtt.join(fin, Seq("monthyr", "grp", "is_slice")) // multi-key inner
        .withColumn("date", date_format(
          to_date(concat(lit("01-"), substring(col("monthyr"), 1, 3), lit("-"),
            substring(col("monthyr"), 4, 4)), "dd-MMM-yyyy"), "yyyy-MM-dd"))
        .select(col("monthyr"), col("grp"), col("is_slice"), col("date"),
          round(col("n_new"), 2).as("n_new"), round(col("n_fin"), 2).as("n_fin"),
          round(col("n_new") / col("n_fin"), 6).as("ratio"))
        .orderBy("date", "grp", "is_slice")
    }),

    // blog:118-180 casemix — per region: each order-priority's share of
    // regional volume, with an ENGLAND block appended (union of rollup
    // grains, the reference's England-casemix-beside-regions shape) and
    // a declarative patch applied to the dimension (blog:91-105 P10).
    "q_casemix" -> ((s, d) => {
      val region = broadcast(Tables.region(s, d)
        .select(col("r_regionkey"),
          // declarative patch table applied as an expression: one
          // region renamed, matching the reference's manual fixes
          when(col("r_name") === "REGION_0", "REGION_ZERO")
            .otherwise(col("r_name")).as("region")))
      val vol = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("region"), col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .cache() // England block re-aggregates this small result
      val england = vol.groupBy("priority").agg(sum("n").as("n"))
        .withColumn("region", lit("ENGLAND"))
      val all = vol.unionByName(england)
      all
        // share as x10k-bigint fixed point (260417 = 26.0417%): rounded
        // doubles drift at ulp level between engines (VERDICT r1).
        .withColumn("share_x10k", bround(
          graft.ops.RelationalOps.shareOfGroup(col("n"), Seq(col("region")))
            * lit(10000.0), 0).cast("bigint"))
        .orderBy("region", "priority")
    }),

    // 3b.:80-120 COVID-period scatter data — the reference's flagship
    // published analysis: period tagging (Dimensions.covidPeriod with
    // era boundaries shifted into this corpus's 1992-98 date range) ->
    // period aggregation -> wide pivot on IS slice (pct_IS, rate18 of
    // the All slice) -> second wide pivot on period -> post-minus-pre
    // deltas. Rates are fixed-point bigints (x100 / x10); deltas are
    // differences of the scaled ints, so everything is bit-exact.
    "q_covid_periods" -> ((s, d) => {
      val f0 = Tables.lineitem(s, d).select(
        to_date(date_trunc("month", col("l_shipdate"))).as("mdate"),
        concat(lit("S"), pmod(col("l_suppkey"), lit(7))).as("specialty"),
        when(col("l_returnflag") === "A", "incomplete")
          .when(col("l_returnflag") === "N", "completeadmitted")
          .otherwise("completenonadmitted").as("typ"),
        when(col("l_discount") > 0.05, "IS").otherwise("NHS").as("independent"),
        when(col("l_quantity") <= 18, 1L).otherwise(0L).as("le18"))
      // monthly grain first (the reference's input is monthly files);
      // cached — the All-slice reagg would replay the fact scan
      val base = f0.groupBy("mdate", "specialty", "typ", "independent")
        .agg(count(lit(1)).as("n"), sum("le18").as("n18")).cache()
      val slices = base.unionByName(
        base.groupBy("mdate", "specialty", "typ")
          .agg(sum("n").as("n"), sum("n18").as("n18"))
          .withColumn("independent", lit("All")))
      val byPeriod = slices
        .withColumn("period", graft.schema.Dimensions.covidPeriod(
          col("mdate"), onset = "1994-01-01", reopen = "1996-01-01"))
        .groupBy("period", "specialty", "typ", "independent")
        .agg(sum("n").as("n"), sum("n18").as("n18"))
      // pivot 1: IS slice -> columns (R1 pivot-wider, multi-agg)
      val w1 = byPeriod.groupBy("period", "specialty", "typ")
        .pivot("independent", Seq("All", "IS"))
        .agg(sum(col("n")).as("n"), sum(col("n18")).as("n18"))
        .select(col("period"), col("specialty"), col("typ"),
          bround(col("IS_n").cast("double") * lit(100.0) / col("All_n").cast("double")
            * lit(100.0), 0).cast("bigint").as("pct_is_x100"),
          bround(col("All_n18").cast("double") * lit(100.0) / col("All_n").cast("double")
            * lit(10.0), 0).cast("bigint").as("rate18_x10"))
      // pivot 2: period -> columns, then the reference's deltas
      val w2 = w1.groupBy("specialty", "typ")
        .pivot("period", Seq("Pre", "During", "Post"))
        .agg(max(col("pct_is_x100")).as("pct_is_x100"),
          max(col("rate18_x10")).as("rate18_x10"))
        .select(col("specialty"), col("typ"),
          col("Pre_pct_is_x100").as("pct_is_pre_x100"),
          col("During_pct_is_x100").as("pct_is_during_x100"),
          col("Post_pct_is_x100").as("pct_is_post_x100"),
          col("Pre_rate18_x10").as("rate18_pre_x10"),
          col("During_rate18_x10").as("rate18_during_x10"),
          col("Post_rate18_x10").as("rate18_post_x10"))
      w2.withColumn("delta_is_x100",
          col("pct_is_post_x100") - col("pct_is_pre_x100"))
        .withColumn("delta_wait_x10",
          col("rate18_post_x10") - col("rate18_pre_x10"))
        .orderBy("specialty", "typ")
    }),

    // §2.9 leftovers: str_to_title (initcap), word(x, 2, '-'),
    // NA-to-0 coalesce, nested ifelse chains.
    "q_f_strings2" -> ((s, d) => {
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          initcap(lower(col("n_name"))).as("title"),
          element_at(split(col("n_name"), "_"), 2).as("word2"),
          coalesce(nullif(col("n_regionkey").cast("bigint"), lit(0L)), lit(0L))
            .as("rk_nz"),
          when(col("n_regionkey") === 0, "alpha")
            .when(col("n_regionkey") === 1, "beta")
            .when(col("n_regionkey") === 2, "gamma")
            .otherwise(concat(lit("other-"), col("n_regionkey"))).as("tier"))
        .orderBy("n_nationkey")
    }))

  val oracles: Map[String, String] = Map(
    "q_ratio_new_to_completed" ->
      """WITH f AS (
        |  SELECT strftime(l_shipdate, '%b') || strftime(l_shipdate, '%Y') AS monthyr,
        |    l_linestatus AS grp,
        |    CASE WHEN l_discount > 0.05 THEN 'IS' ELSE 'Non-IS' END AS is_slice,
        |    CASE l_returnflag WHEN 'R' THEN 'newRTT'
        |         WHEN 'N' THEN 'completed' ELSE 'other' END AS pathway,
        |    l_quantity
        |  FROM lineitem),
        |base AS (
        |  SELECT monthyr, grp, is_slice, pathway, sum(l_quantity) AS n
        |  FROM f GROUP BY 1, 2, 3, 4),
        |slices AS (
        |  SELECT monthyr, grp, 'Total' AS is_slice, pathway, sum(n) AS n
        |  FROM base GROUP BY 1, 2, 4
        |  UNION ALL SELECT monthyr, grp, is_slice, pathway, n FROM base),
        |j AS (
        |  SELECT a.monthyr, a.grp, a.is_slice, a.n AS n_new, b.n AS n_fin
        |  FROM slices a JOIN slices b
        |    ON a.monthyr = b.monthyr AND a.grp = b.grp AND a.is_slice = b.is_slice
        |  WHERE a.pathway = 'newRTT' AND b.pathway = 'completed')
        |SELECT monthyr, grp, is_slice,
        |  strftime(strptime('01-' || substr(monthyr, 1, 3) || '-' ||
        |    substr(monthyr, 4, 4), '%d-%b-%Y'), '%Y-%m-%d') AS date,
        |  round(n_new, 2) AS n_new, round(n_fin, 2) AS n_fin,
        |  round(n_new / n_fin, 6) AS ratio
        |FROM j ORDER BY date, grp, is_slice""".stripMargin,
    "q_casemix" ->
      """WITH vol AS (
        |  SELECT CASE WHEN r_name = 'REGION_0' THEN 'REGION_ZERO'
        |              ELSE r_name END AS region,
        |    o_orderpriority AS priority, count(*) AS n
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT region, priority, n FROM vol
        |  UNION ALL
        |  SELECT 'ENGLAND', priority, sum(n) FROM vol GROUP BY 2)
        |SELECT region, priority, CAST(n AS BIGINT) AS n,
        |  CAST(round_even(100.0 * n / sum(n) OVER (PARTITION BY region)
        |    * 10000, 0) AS BIGINT) AS share_x10k
        |FROM a ORDER BY region, priority""".stripMargin,
    "q_covid_periods" ->
      """WITH f AS (
        |  SELECT date_trunc('month', l_shipdate) AS mdate,
        |    'S' || (l_suppkey % 7) AS specialty,
        |    CASE l_returnflag WHEN 'A' THEN 'incomplete'
        |         WHEN 'N' THEN 'completeadmitted'
        |         ELSE 'completenonadmitted' END AS typ,
        |    CASE WHEN l_discount > 0.05 THEN 'IS' ELSE 'NHS' END AS independent,
        |    CASE WHEN l_quantity <= 18 THEN 1 ELSE 0 END AS le18
        |  FROM lineitem),
        |base AS (
        |  SELECT mdate, specialty, typ, independent,
        |    count(*) AS n, sum(le18) AS n18
        |  FROM f GROUP BY 1, 2, 3, 4),
        |slices AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT mdate, specialty, typ, 'All', sum(n), sum(n18)
        |  FROM base GROUP BY 1, 2, 3),
        |p AS (
        |  SELECT CASE WHEN mdate < DATE '1994-01-01' THEN 'Pre'
        |              WHEN mdate < DATE '1996-01-01' THEN 'During'
        |              ELSE 'Post' END AS period,
        |    specialty, typ, independent, sum(n) AS n, sum(n18) AS n18
        |  FROM slices GROUP BY 1, 2, 3, 4),
        |w1 AS (
        |  SELECT period, specialty, typ,
        |    max(CASE WHEN independent = 'All' THEN n END) AS n_all,
        |    max(CASE WHEN independent = 'IS' THEN n END) AS n_is,
        |    max(CASE WHEN independent = 'All' THEN n18 END) AS n18_all
        |  FROM p GROUP BY 1, 2, 3),
        |w2 AS (
        |  SELECT period, specialty, typ,
        |    CAST(round_even(n_is * 100.0 / n_all * 100, 0) AS BIGINT) AS pct_is_x100,
        |    CAST(round_even(n18_all * 100.0 / n_all * 10, 0) AS BIGINT) AS rate18_x10
        |  FROM w1),
        |w3 AS (
        |  SELECT specialty, typ,
        |    max(CASE WHEN period = 'Pre' THEN pct_is_x100 END) AS pct_is_pre_x100,
        |    max(CASE WHEN period = 'During' THEN pct_is_x100 END) AS pct_is_during_x100,
        |    max(CASE WHEN period = 'Post' THEN pct_is_x100 END) AS pct_is_post_x100,
        |    max(CASE WHEN period = 'Pre' THEN rate18_x10 END) AS rate18_pre_x10,
        |    max(CASE WHEN period = 'During' THEN rate18_x10 END) AS rate18_during_x10,
        |    max(CASE WHEN period = 'Post' THEN rate18_x10 END) AS rate18_post_x10
        |  FROM w2 GROUP BY 1, 2)
        |SELECT specialty, typ,
        |  pct_is_pre_x100, pct_is_during_x100, pct_is_post_x100,
        |  rate18_pre_x10, rate18_during_x10, rate18_post_x10,
        |  pct_is_post_x100 - pct_is_pre_x100 AS delta_is_x100,
        |  rate18_post_x10 - rate18_pre_x10 AS delta_wait_x10
        |FROM w3 ORDER BY specialty, typ""".stripMargin,
    "q_f_strings2" ->
      """SELECT n_nationkey,
        |  upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS title,
        |  split_part(n_name, '_', 2) AS word2,
        |  coalesce(nullif(CAST(n_regionkey AS BIGINT), 0), 0) AS rk_nz,
        |  CASE n_regionkey WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
        |       WHEN 2 THEN 'gamma'
        |       ELSE 'other-' || n_regionkey END AS tier
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
