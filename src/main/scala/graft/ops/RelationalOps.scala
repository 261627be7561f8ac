package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational operators from the reference that need explicit
  * semantics beyond a single built-in call (SURVEY.md §2). All are
  * expression/plan compositions — Catalyst sees through every one of
  * them (pushdown, pruning, partial aggregation still apply).
  */
object RelationalOps {

  /** Null-pair-dropping weighted mean, R `weighted.mean(x, w, na.rm=TRUE)`
    * (`1a.:112-114`, `3c.:183-185`): pairs where EITHER the value or the
    * weight is null are dropped from both numerator and denominator.
    * Use inside `.agg(...)`; partial+final aggregation applies. */
  def weightedMean(x: Column, w: Column): Column = {
    val both = x.isNotNull && w.isNotNull
    val num = sum(when(both, x.cast("double") * w.cast("double")))
    val den = sum(when(both, w.cast("double")))
    when(den.isNull || den === 0d, lit(null).cast("double")).otherwise(num / den)
  }

  /** Inverted decile/quintile: R `11 - ntile(score, 10)` (`1a.:116-118`)
    * — highest scores land in decile 1 (most deprived). Supply a
    * deterministic `order` (include a tiebreaker column: R's ntile is
    * input-order-dependent on ties; we pin the order instead). */
  def invertedNtile(n: Int, partition: Seq[Column], order: Seq[Column]): Column = {
    val w = if (partition.isEmpty) Window.orderBy(order: _*)
            else Window.partitionBy(partition: _*).orderBy(order: _*)
    lit(n + 1) - ntile(n).over(w)
  }

  /** `plyr::rbind.fill` (`1b.:386`, `1a.:171-175`) — union by column name,
    * null-filling columns missing on either side. The workhorse of the
    * reference's monthly-append / era-drift handling. */
  def rbindFill(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Deterministic grouped dedup-keep-one (`1c.:68-71`, `1b.:283`):
    * R keeps the first row in file order; we pin an explicit ordering
    * (SURVEY §7.4-5) and keep the row ranked first within each key.
    * One shuffle on `keys`; at scale prefer this over
    * `orderBy().dropDuplicates()` which gives no ordering guarantee. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-1 per group by a ranking expression (`1c.:412-416`,
    * `top_n(1, abs(n))`). */
  def topOnePerGroup(df: DataFrame, keys: Seq[String], rank: Column): DataFrame =
    dedupKeepFirst(df, keys, Seq(rank.desc))

  /** Drop columns that are entirely null in the current data
    * (`not_all_na`, `2.:35` + `2.:141-144`) — schema-adaptive band
    * selection per month/era. One extra aggregate pass over the
    * candidate columns (count() per column is a cheap partial agg),
    * then a plain projection; the scan for the main job still prunes
    * to the surviving columns. */
  def dropAllNullColumns(df: DataFrame, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    if (present.isEmpty) df
    else {
      val counts = df.agg(
        count(col(present.head)).as(present.head),
        present.tail.map(c => count(col(c)).as(c)): _*).head()
      val dead = present.filter(c => counts.getAs[Long](c) == 0L)
      df.drop(dead: _*)
    }
  }

  /** Sort key for a custom categorical ordering (`fct_relevel`,
    * `3c.:283-298`): position of the value in an explicit level list;
    * unknown values sort last. */
  def categoricalOrder(c: Column, levels: Seq[String]): Column = {
    val pos = array_position(lit(levels.toArray), c)
    when(pos === 0, lit(Long.MaxValue)).otherwise(pos)
  }

  /** Per-group share-of-total percent via a window (`3c.:456-463`,
    * `blog:133-136`): value / sum(value) over partition * 100. */
  def shareOfGroup(value: Column, partition: Seq[Column]): Column = {
    val total = sum(value).over(Window.partitionBy(partition: _*))
    when(total.isNull || total === 0, lit(null).cast("double"))
      .otherwise(value.cast("double") * lit(100.0) / total.cast("double"))
  }
}
