package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{HistogramOps => H, RelationalOps => R}

/** Core relational operator corpus — one query per operator family from
  * SURVEY.md §2, expressed over the driver's star-schema test tables,
  * each with a DuckDB oracle in [[oracles]].
  *
  * Conventions (driver compare = column-name-sorted value hash):
  *   - every computed column is aliased identically in Spark and SQL;
  *   - every floating-point AGGREGATE is rounded (2–6 dp) on both sides
  *     so summation-order ulp drift can't flip the hash; raw columns
  *     read from parquet are emitted unrounded (bit-identical anyway);
  *   - every query ends in a deterministic ORDER BY (unique tiebreaker);
  *   - int-valued functions are cast to bigint on both sides so the
  *     parquet schema matches DuckDB's int64 defaults.
  *
  * Scale notes are inline per query: what shuffles, what broadcasts,
  * what pushes down.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Skew-mitigation ops in the HASH GATE: salting only changes
    // physical distribution, so the salted join + salted two-phase
    // aggregate must be bit-identical to the plain SQL — the oracle
    // proves the semantics-preserving claim directly (plan shape is
    // asserted in ScaleOpsSpec). Integer-cast sums: partial grouping
    // varies with the salt, so only order-proof aggregates belong here.
    "q_scale_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"),
          col("l_quantity").cast("bigint").as("qty"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      val joined = graft.ops.ScaleOps.saltedJoin(li, sup, "suppkey", buckets = 8)
      graft.ops.ScaleOps.saltedAgg(joined, "s_nationkey", buckets = 8,
          partial = Seq(sum(col("qty")).as("s"), count(lit(1)).as("c")),
          combine = Seq(sum(col("s")).as("sum_qty"), sum(col("c")).as("n_rows")))
        .orderBy("s_nationkey")
    }),
    // P3+P4 — SCHEMA-DRIVEN projection: select columns matching a name
    // pattern off the LIVE schema (the reference's `Gt.*` band
    // selection) after dropping columns that are entirely null in the
    // data (its `not_all_na` pruning). The surviving column set
    // depends on schema AND data, so it is emitted AS ROWS
    // (col_name, n_nonnull) — the oracle pins the expected survivors:
    // x_dead must be absent, x_partial present.
    "q_p3_dynamic_projection" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .withColumn("x_partial",
          when(col("o_orderkey") % 10 === 0, col("o_orderkey")))
        .withColumn("x_dead", lit(null).cast("bigint"))
      val pruned = R.dropAllNullColumns(base, Seq("x_partial", "x_dead"))
      val cols = pruned.columns.toSeq
        .filter(c => c.startsWith("o_order") || c.startsWith("x_")).sorted
      pruned
        .agg(count(col(cols.head)).as("cnt_0"),
          cols.tail.zipWithIndex.map { case (c, i) =>
            count(col(c)).as(s"cnt_${i + 1}")
          }: _*)
        .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
          struct(lit(c).as("col_name"), col(s"cnt_$i").as("n_nonnull"))
        }: _*)).as("kv"))
        .select(col("kv.col_name"), col("kv.n_nonnull"))
        .orderBy("col_name")
    }),

    // P1+P5 — projection + conjunctive filter. Both the filter and the
    // 4-column projection reach the parquet scan (PushedFilters/ReadSchema).
    "q_p5_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25
          && col("l_linestatus") =!= "O")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P6 — membership filter (isin); pushed down as In.
    "q_p6_membership" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // P7 — null-predicate filter (nulls manufactured via nullif: the
    // star tables are fully non-null).
    "q_p7_null_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("disc_or_null", nullif(col("l_discount"), lit(0.0)))
        .filter(col("disc_or_null").isNull)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P8 — regex filter (rlike), evaluated post-scan in codegen.
    "q_p8_regex_filter" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").rlike("(red|blue)"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // P10 — conditional column overwrite (declarative patch, blog:91-105).
    "q_p10_patch" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", lit("CONSTRUCTION"))
            .otherwise(col("c_mktsegment")).as("segment"))
        .orderBy("c_custkey")
    }),

    // J1+A1 — fact⋈dim left equi-join with an explicitly broadcast dim
    // (part is small relative to lineitem at every SF; at 100 TB the dim
    // side stays MBs ⇒ broadcast hash join, no shuffle of the fact).
    "q_j1_broadcast_join" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"), "left")
        .groupBy("p_brand")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // J2 — chained equi-joins on differing key names, both dims broadcast.
    "q_j2_dim_chain" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name")
    }),

    // J4 — semi-join membership flag (IS_provider pattern, 1b:380):
    // left join against a distinct key set + null test. NO broadcast
    // hint: the key set derives from the FACT table, so its size scales
    // with fact volume — let AQE decide at runtime (the reference's
    // real membership lists are dim-sized, where Ingest
    // .withIsProviderFlag does broadcast).
    "q_j4_semi_flag" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey").as("big_key")).distinct()
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("big_key"), "left")
        .select(col("o_orderkey"),
          when(col("big_key").isNotNull, lit(1L)).otherwise(lit(0L)).as("has_big"))
        .orderBy("o_orderkey")
    }),

    // J5 — anti join (negated membership, 1c:396-399).
    "q_j5_anti" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 40).select("l_orderkey")
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // J6 — cross-join parameter grid (expand.grid, 3b:44-48). Both sides
    // tiny: grids are dimension-sized by construction.
    "q_j6_cross_grid" -> ((s, d) => {
      val statuses = Tables.orders(s, d)
        .select(col("o_orderstatus").as("status")).distinct()
      Tables.region(s, d).select("r_name")
        .crossJoin(broadcast(statuses))
        .orderBy("r_name", "status")
    }),

    // A1 — the classic grouped-sum scan (TPC-H Q1 shape): one shuffle,
    // partial aggregation map-side, whole-stage codegen end to end.
    "q_a1_groupsum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A3 — null-pair-dropping weighted mean (1a:112-114).
    "q_a3_weighted_mean" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(R.weightedMean(col("l_discount"), col("l_quantity")), 6)
          .as("wavg_disc"))
        .orderBy("l_returnflag")
    }),

    // A5+A6 — count / exact distinct count (n_distinct, 3c:99).
    "q_a6_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // A7 — ordered string-agg of distinct values (3c:127); array_sort
    // pins the order the reference leaves to chance.
    "q_a7_string_agg" -> ((s, d) => {
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(", ", array_sort(collect_set(col("n_name")))).as("nations"))
        .orderBy("r_name")
    }),

    // A8 — flag-max aggregation (3c:124-128).
    "q_a8_flag_max" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          max(when(col("c_mktsegment") === "AUTOMOBILE", lit(1L)).otherwise(lit(0L)))
            .as("has_auto"),
          max(when(col("c_acctbal") < 0, lit(1L)).otherwise(lit(0L)))
            .as("has_debtor"))
        .orderBy("c_nationkey")
    }),

    // A9/A10 — share-of-group-total via window over a pre-aggregate
    // (3c:456-463): agg shuffles once; the window reuses the (small)
    // aggregated side.
    "q_a9_share_window" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("share",
          round(R.shareOfGroup(col("n"), Seq(col("o_orderpriority"))), 4))
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // A17 — ENGLAND-style rollup: per-group rows AND grand totals in ONE
    // pass (replaces the reference's per-value rescans, 2:148-150).
    "q_a17_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }),

    // W1 — inverted ntile deciles (1a:116-118), deterministic tiebreak.
    "q_w1_inverted_ntile" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          R.invertedNtile(10, Seq(col("c_mktsegment")),
            Seq(col("c_acctbal"), col("c_custkey"))).cast("bigint")
            .as("inv_decile"))
        .orderBy("c_custkey")
    }),

    // W2 — running cumulative sum (2:243-248 long form).
    "q_w2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W3 — top-1 per group (1c:412-416).
    "q_w3_top1_per_group" -> ((s, d) => {
      R.dedupKeepFirst(
        Tables.orders(s, d),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // O2 — custom categorical ordering (fct_relevel, 3c:283-298):
    // materialized as an explicit sort-rank column.
    "q_o2_custom_order" -> ((s, d) => {
      val levels = Seq("3-MEDIUM", "1-URGENT", "5-LOW", "2-HIGH", "4-NOT SPECIFIED")
      Tables.orders(s, d)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .withColumn("sort_rank",
          R.categoricalOrder(col("o_orderpriority"), levels).cast("bigint"))
        .orderBy("sort_rank", "o_orderpriority")
    }),

    // O2b — DATA-DRIVEN categorical ordering (SU:169-179: regions
    // ordered by mean ophthalmology share, not by a literal level
    // list): compute the order table, join the rank back, sort by it.
    // The rank key is an x100-bigint (bround, rateX10 pattern) so
    // cross-engine avg ulp drift can't flip near-tied ranks. The order
    // table's global window is DIMENSION-SIZED by construction (25
    // nations) — the detail rows join the broadcast rank, they never
    // pass through the window.
    "q_o2b_data_order" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      val order = cust.groupBy("n_name")
        .agg(bround(avg("c_acctbal") * 100.0, 0).cast("bigint").as("mean_bal_c"))
        .withColumn("nation_rank", row_number()
          .over(Window.orderBy(col("mean_bal_c").desc, col("n_name")))
          .cast("bigint"))
      cust.groupBy("n_name", "c_mktsegment").agg(count(lit(1)).as("n"))
        .join(broadcast(order), Seq("n_name"))
        .orderBy("nation_rank", "c_mktsegment")
        .select("n_name", "c_mktsegment", "n", "nation_rank", "mean_bal_c")
    }),

    // O3 — ordered top-k (blog:109-115 head(11)); unique tiebreaker so
    // the k-boundary is deterministic across engines.
    "q_o3_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum("o_totalprice").as("spend_raw"), count(lit(1)).as("n_orders"))
        .orderBy(col("spend_raw").desc, col("o_custkey"))
        .limit(11)
        .select(col("o_custkey"), round(col("spend_raw"), 2).as("spend"),
          col("n_orders"))
    }),

    // U1 — union-by-name with missing-column fill (rbind.fill, 1b:386).
    "q_u1_union_fill" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("key"), col("s_name").as("name"))
      R.rbindFill(Seq(c, sup)).orderBy("name")
    }),

    // One-pass column profiling (ops.Profiling): row/null/distinct
    // counts + typed min/max per column in a single aggregation job,
    // exploded back to rows inside the plan. A planted nullable
    // column exercises the null path (orders itself is null-free).
    "q_profile_stats" -> ((s, d) => {
      val t = Tables.orders(s, d)
        .withColumn("status_n",
          when(col("o_orderstatus") =!= "P", col("o_orderstatus")))
      graft.ops.Profiling.profile(t,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "status_n",
            "o_orderpriority", "o_orderdate"))
        .orderBy("column")
    }),

    // Snapshot diff / CDC derivation (ops.SnapshotDiff): classify
    // every order key across two deterministic snapshots of the same
    // table (adds at % 13 = 3, deletes at % 13 = 5, price patches at
    // % 7 = 0) — money compared in exact cents, one full-outer join.
    "q_cdc_diff" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"),
        bround(col("o_totalprice") * 100, 0).cast("bigint").as("o_cents"))
      val oldSnap = base.where(col("o_orderkey") % 13 =!= 3)
      val newSnap = base.where(col("o_orderkey") % 13 =!= 5)
        .withColumn("o_cents", when(col("o_orderkey") % 7 === 0,
          col("o_cents") + 10000L).otherwise(col("o_cents")))
      graft.ops.SnapshotDiff
        .diff(oldSnap, newSnap, Seq("o_orderkey"), Seq("o_orderstatus", "o_cents"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sum_keys"),
          sum(coalesce(col("new_o_cents"), lit(0L)) -
            coalesce(col("old_o_cents"), lit(0L))).as("sum_delta_cents"))
        .orderBy("change_type")
    }),

    // CDC APPLY (the consume step): reconstruct the new snapshot from
    // the old one plus the diff feed, then aggregate the
    // reconstruction. The oracle aggregates the directly-constructed
    // new snapshot — the round-trip law apply(old, diff(old,new)) ==
    // new IS the gate.
    "q_cdc_apply" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"),
        bround(col("o_totalprice") * 100, 0).cast("bigint").as("o_cents"))
      val oldSnap = base.where(col("o_orderkey") % 13 =!= 3)
      val newSnap = base.where(col("o_orderkey") % 13 =!= 5)
        .withColumn("o_cents", when(col("o_orderkey") % 7 === 0,
          col("o_cents") + 10000L).otherwise(col("o_cents")))
      val feed = graft.ops.SnapshotDiff.diff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_cents"))
      graft.ops.SnapshotDiff.applyDiff(oldSnap, feed,
          Seq("o_orderkey"), Seq("o_orderstatus", "o_cents"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sum_keys"),
          sum("o_cents").as("sum_cents"))
        .orderBy("o_orderstatus")
    }),

    // U3 — distinct.
    "q_u3_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // R1 — pivot long→wide with EXPLICIT value list (SURVEY §7.4-8: no
    // extra distinct scan, deterministic plan).
    "q_r1_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("o_orderpriority")
    }),

    // R2 — unpivot wide→long (melt/stack).
    "q_r2_unpivot" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          expr("stack(2, 'p_size', cast(p_size as double), " +
            "'p_retailprice', p_retailprice) as (attr, val)"))
        .orderBy("p_partkey", "attr")
    }),

    // R4 — literal calendar dimension (year_lkup, 1b:58-79).
    "q_r4_calendar" -> ((s, d) => {
      s.range(1)
        .select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-12-01")),
          expr("interval 1 month"))).as("d"))
        .select(date_format(col("d"), "yyyy-MM").as("month"))
        .orderBy("month")
    }),

    // §2.9 strings — regexp_extract / case / substring / length.
    "q_f_strings" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 3).as("pre3"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          length(col("p_name")).cast("bigint").as("len"))
        .orderBy("p_partkey")
    }),

    // §2.9 dates — year/month extraction + grouped agg.
    "q_f_dates" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("bigint").as("yr"),
          month(col("o_orderdate")).cast("bigint").as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr", "mo")
    }),

    // §2.9 conditional — COVID-period-style date-range tagging (3b:84-87).
    "q_f_case_period" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderdate") < lit("1997-01-01").cast("timestamp"), lit("Pre"))
            .when(col("o_orderdate") < lit("1999-01-01").cast("timestamp"), lit("During"))
            .otherwise(lit("Post")).as("period"))
        .groupBy("period").agg(count(lit(1)).as("n"))
        .orderBy("period")
    }),

    // §2.9 math — sqrt/ln/pow/abs + R-style banker's rounding (bround ↔
    // DuckDB round_even; SURVEY §7.4-2).
    "q_f_math" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          round(sqrt(col("p_retailprice")), 4).as("sq"),
          round(log(col("p_retailprice")), 4).as("lg"),
          round(pow(col("p_retailprice"), 0.35), 4).as("pw"),
          abs(col("p_size") - lit(25)).cast("bigint").as("ab"),
          bround(col("p_retailprice"), 1).as("br"))
        .orderBy("p_partkey")
    }),

    // A2+A12+A13 — the reference's semantic heart on test data: build a
    // per-group histogram (band = integral l_quantity, 1..50), then
    // median/p92/p95 via the cum<target scan, %<=18 rate, #>45 count.
    // Two-level agg: (group, band) counts → per-group 50-slot array; the
    // array then flows through ONE row per group (105x fewer cells than
    // long-form at RTT widths — the 100 TB design, SURVEY §4).
    "q_a12_hist_quantile" -> ((s, d) => {
      val bands = 50
      val h = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity").cast("bigint").as("band"))
        .agg(count(lit(1)).as("c"))
      val arr = h.groupBy("l_returnflag")
        .agg(map_from_arrays(collect_list(col("band")), collect_list(col("c")))
          .as("m"))
        .select(col("l_returnflag"),
          transform(sequence(lit(1), lit(bands)),
            i => coalesce(try_element_at(col("m"), i.cast("bigint")), lit(0L)))
            .as("weeks"))
      arr
        .withColumn("cum", H.cumulative(col("weeks")))
        .withColumn("total", element_at(col("cum"), bands))
        .select(col("l_returnflag"),
          H.quantile(col("cum"), col("total"), 0.5).as("median_band"),
          H.quantile(col("cum"), col("total"), 0.92).as("p92_band"),
          H.quantile(col("cum"), col("total"), 0.95).as("p95_band"),
          // x10-bigint fixed point: bit-exact across engines (doubles
          // rounded to 1 dp are not — VERDICT r1, 5 ulp-drift hash fails).
          H.rateX10(H.countAtOrBelow(col("cum"), 18), col("total")).as("pct_le18_x10"),
          H.countAbove(col("cum"), col("total"), 45).as("n_gt45"),
          col("total"))
        .orderBy("l_returnflag")
    }))

  val oracles: Map[String, String] = Map(
    "q_scale_salted" ->
      """SELECT s_nationkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_p3_dynamic_projection" ->
      """SELECT 'o_orderdate' AS col_name, count(o_orderdate) AS n_nonnull FROM orders
        |UNION ALL SELECT 'o_orderkey', count(o_orderkey) FROM orders
        |UNION ALL SELECT 'o_orderpriority', count(o_orderpriority) FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(o_orderstatus) FROM orders
        |UNION ALL SELECT 'x_partial',
        |  count(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) FROM orders
        |ORDER BY col_name""".stripMargin,
    "q_p5_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 25 AND l_linestatus <> 'O'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_p6_membership" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "q_p7_null_filter" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE nullif(l_discount, 0.0) IS NULL ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_p8_regex_filter" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '(red|blue)') ORDER BY p_partkey""".stripMargin,
    "q_p10_patch" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'CONSTRUCTION'
        |       ELSE c_mktsegment END AS segment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_j1_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_j2_dim_chain" ->
      """SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_j4_semi_flag" ->
      """SELECT o_orderkey,
        |  CASE WHEN b.big_key IS NOT NULL THEN 1 ELSE 0 END AS has_big
        |FROM orders LEFT JOIN
        |  (SELECT DISTINCT l_orderkey AS big_key FROM lineitem WHERE l_quantity > 45) b
        |  ON o_orderkey = b.big_key
        |ORDER BY o_orderkey""".stripMargin,
    "q_j5_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 40)
        |ORDER BY o_orderkey""".stripMargin,
    "q_j6_cross_grid" ->
      """SELECT r_name, status FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
        |ORDER BY r_name, status""".stripMargin,
    "q_a1_groupsum" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_a3_weighted_mean" ->
      """SELECT l_returnflag,
        |  round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_a6_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_a7_string_agg" ->
      """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_a8_flag_max" ->
      """SELECT c_nationkey,
        |  max(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS has_auto,
        |  max(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS has_debtor
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_a9_share_window" ->
      """SELECT o_orderpriority, o_orderstatus, n,
        |  round(100.0 * n / sum(n) OVER (PARTITION BY o_orderpriority), 4) AS share
        |FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |      FROM orders GROUP BY 1, 2) t
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q_a17_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_w1_inverted_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  11 - ntile(10) OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS inv_decile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_w3_top1_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM
        |  (SELECT o_custkey, o_orderkey, o_totalprice,
        |     row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |   FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_o2_custom_order" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CASE o_orderpriority
        |    WHEN '3-MEDIUM' THEN 1 WHEN '1-URGENT' THEN 2 WHEN '5-LOW' THEN 3
        |    WHEN '2-HIGH' THEN 4 WHEN '4-NOT SPECIFIED' THEN 5
        |    ELSE 9223372036854775807 END AS sort_rank
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY sort_rank, o_orderpriority""".stripMargin,
    "q_o2b_data_order" ->
      """WITH c AS (
        |  SELECT n_name, c_mktsegment, c_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |ord AS (
        |  SELECT n_name,
        |    CAST(round_even(avg(c_acctbal) * 100.0, 0) AS BIGINT) AS mean_bal_c
        |  FROM c GROUP BY n_name),
        |rnk AS (
        |  SELECT n_name, mean_bal_c,
        |    row_number() OVER (ORDER BY mean_bal_c DESC, n_name) AS nation_rank
        |  FROM ord)
        |SELECT c.n_name, c_mktsegment, count(*) AS n, nation_rank, mean_bal_c
        |FROM c JOIN rnk ON c.n_name = rnk.n_name
        |GROUP BY c.n_name, c_mktsegment, nation_rank, mean_bal_c
        |ORDER BY nation_rank, c_mktsegment""".stripMargin,
    "q_o3_topk" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS spend, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY sum(o_totalprice) DESC, o_custkey LIMIT 11""".stripMargin,
    "q_u1_union_fill" ->
      """SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) FROM supplier
        |ORDER BY name""".stripMargin,
    "q_u3_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_profile_stats" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderstatus <> 'P' THEN o_orderstatus END AS status_n,
        |    o_orderpriority, o_orderdate
        |  FROM orders),
        |p AS (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
        |    count(*) - count(o_orderkey) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_val,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM t
        |  UNION ALL
        |  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM t
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |    count(DISTINCT o_orderstatus),
        |    min(o_orderstatus), max(o_orderstatus) FROM t
        |  UNION ALL
        |  SELECT 'status_n', count(*), count(*) - count(status_n),
        |    count(DISTINCT status_n), min(status_n), max(status_n) FROM t
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |    count(DISTINCT o_orderpriority),
        |    min(o_orderpriority), max(o_orderpriority) FROM t
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |    count(DISTINCT o_orderdate),
        |    CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |  FROM t)
        |SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_nulls AS BIGINT) AS n_nulls,
        |  CAST(n_distinct AS BIGINT) AS n_distinct, min_val, max_val
        |FROM p ORDER BY "column"""".stripMargin,
    // the round-trip law: the reconstruction must equal the directly
    // constructed new snapshot, aggregated
    "q_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS o_cents
        |  FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_cents + 10000
        |      ELSE o_cents END AS o_cents
        |  FROM base WHERE o_orderkey % 13 <> 5)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(sum(o_cents) AS BIGINT) AS sum_cents
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cdc_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS o_cents
        |  FROM orders),
        |o AS (SELECT * FROM base WHERE o_orderkey % 13 <> 3),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_cents + 10000
        |      ELSE o_cents END AS o_cents
        |  FROM base WHERE o_orderkey % 13 <> 5),
        |j AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
        |    o.o_orderkey IS NOT NULL AS in_old,
        |    n.o_orderkey IS NOT NULL AS in_new,
        |    o.o_orderstatus AS os, n.o_orderstatus AS ns,
        |    o.o_cents AS oc, n.o_cents AS nc
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey),
        |c AS (
        |  SELECT k,
        |    CASE WHEN NOT in_old THEN 'added'
        |      WHEN NOT in_new THEN 'removed'
        |      WHEN os IS DISTINCT FROM ns OR oc IS DISTINCT FROM nc
        |        THEN 'changed'
        |      ELSE 'unchanged' END AS change_type,
        |    oc, nc
        |  FROM j)
        |SELECT change_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_keys,
        |  CAST(sum(coalesce(nc, 0) - coalesce(oc, 0)) AS BIGINT)
        |    AS sum_delta_cents
        |FROM c WHERE change_type <> 'unchanged'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_r1_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_r2_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part) t
        |ORDER BY p_partkey, attr""".stripMargin,
    "q_r4_calendar" ->
      """SELECT strftime(d, '%Y-%m') AS month FROM
        |  (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-01',
        |                                 INTERVAL 1 MONTH)) AS d) t
        |ORDER BY month""".stripMargin,
    "q_f_strings" ->
      """SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 3) AS pre3,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  CAST(length(p_name) AS BIGINT) AS len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_f_dates" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q_f_case_period" ->
      """SELECT period, count(*) AS n FROM (
        |  SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 'Pre'
        |              WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'During'
        |              ELSE 'Post' END AS period
        |  FROM orders) t
        |GROUP BY period ORDER BY period""".stripMargin,
    "q_f_math" ->
      """SELECT p_partkey, round(sqrt(p_retailprice), 4) AS sq,
        |  round(ln(p_retailprice), 4) AS lg,
        |  round(pow(p_retailprice, 0.35), 4) AS pw,
        |  CAST(abs(p_size - 25) AS BIGINT) AS ab,
        |  round_even(p_retailprice, 1) AS br
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_a12_hist_quantile" ->
      """WITH spine AS (
        |  SELECT rf.l_returnflag, b.band FROM
        |    (SELECT DISTINCT l_returnflag FROM lineitem) rf
        |    CROSS JOIN (SELECT unnest(generate_series(1, 50)) AS band) b),
        |h AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS band, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (
        |  SELECT s.l_returnflag, s.band,
        |    sum(coalesce(h.c, 0)) OVER (PARTITION BY s.l_returnflag
        |      ORDER BY s.band) AS cum,
        |    sum(coalesce(h.c, 0)) OVER (PARTITION BY s.l_returnflag) AS total
        |  FROM spine s LEFT JOIN h
        |    ON s.l_returnflag = h.l_returnflag AND s.band = h.band)
        |SELECT l_returnflag,
        |  count(*) FILTER (WHERE cum < 0.5 * total) AS median_band,
        |  count(*) FILTER (WHERE cum < 0.92 * total) AS p92_band,
        |  count(*) FILTER (WHERE cum < 0.95 * total) AS p95_band,
        |  CAST(round_even(100.0 * max(CASE WHEN band = 18 THEN cum END) / max(total)
        |    * 10, 0) AS BIGINT) AS pct_le18_x10,
        |  CAST(max(total) - max(CASE WHEN band = 45 THEN cum END) AS BIGINT)
        |    AS n_gt45,
        |  CAST(max(total) AS BIGINT) AS total
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
