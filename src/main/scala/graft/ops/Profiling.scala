package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-PASS column profiling — the ANALYZE TABLE / data-quality
  * staple: per column, row count, null count, exact distinct count,
  * and min/max (computed in the column's own type, rendered as
  * strings so heterogeneous columns share one output schema). Used
  * for ingest monitoring (a column suddenly 40% null, a key whose
  * distinct count stops growing) and as planner-style table stats.
  *
  * Scale shape: ONE aggregation job over the scan — all columns'
  * aggregates ride the same pass, and the wide single-row result is
  * exploded back to (column, stats) rows inside the plan (no driver
  * collect). The exact multi-column distinct makes Catalyst plan an
  * Expand (one duplicated stream per distinct aggregate): exact is
  * the gate-checkable default, `approxDistinct = true` swaps in
  * HLL++ `approx_count_distinct`, which fuses into the single
  * partial-agg pass — the 100 TB setting (the A6/q_t_approx_distinct
  * trade, per-column). */
object Profiling {

  // Generated aliases are re-parsed by col(); a profiled name holding
  // a dot would read back as a nested-field reference. Backtick-quote
  // (doubling embedded backticks) both the input lookup and the alias
  // round-trip so any legal column name profiles cleanly.
  private def q(name: String): String =
    "`" + name.replace("`", "``") + "`"

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(q(c))).as(s"__cnt_$c"),
        (if (approxDistinct) approx_count_distinct(col(q(c)))
         else count_distinct(col(q(c)))).as(s"__nd_$c"),
        min(col(q(c))).cast("string").as(s"__min_$c"),
        max(col(q(c))).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(q(s"__cnt_$c"))).as("n_nulls"),
      col(q(s"__nd_$c")).as("n_distinct"),
      col(q(s"__min_$c")).as("min_val"),
      col(q(s"__max_$c")).as("max_val"))): _*)
    wide.select(explode(perCol).as("p")).select("p.*")
  }
}
