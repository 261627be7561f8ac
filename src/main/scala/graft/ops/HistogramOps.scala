package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Histogram (wait-band) vector operations — the semantic heart of the
  * reference's `dashboard_stats_*` family.
  *
  * The reference stores a per-group histogram as ~105 wide columns
  * `Gt.00.To.01.Weeks.SUM.1 … Gt.104.Weeks.SUM.1` and computes, per group:
  *   - a cumulative sum over band index
  *     (`2. Produce descriptive statistics.R:243-248`),
  *   - quantiles as `min{w : cum[w] >= q*total} - 1`
  *     (`2.:233-249`, `2.:413-431`),
  *   - threshold rates `#<=18wk = cum[18]`, `#>52wk = total - cum[52]`
  *     (`2.:254-261`, `2.:433-440`),
  *   - small-number suppression when the eligible total < 20
  *     (`2.:233`, `2.:277-298`).
  *
  * Here the histogram is a single `ArrayType(LongType)` column (1-based
  * band semantics: array slot i holds the count of band i+1), and every
  * op is a pure expression composition — fully codegen'd by Catalyst, no
  * UDFs. At 100 TB this keeps the band vector as ONE column through the
  * shuffle (105x fewer cells than long-form) and keeps the quantile scan
  * inside whole-stage codegen.
  */
object HistogramOps {

  /** Grouped element-wise sum of histogram arrays; use inside `.agg(...)`.
    * Compiles to `maxBands` ordinary `sum` aggregates (partial+final, so
    * map-side combine applies — the only scalable shape for a grouped
    * vector sum at 100 TB; `collect_list`-style approaches buffer whole
    * groups). Arrays may be shorter in early eras (52-band vs 105-band
    * months, SURVEY §7.4-3): out-of-range bands read as null and are
    * skipped, all-null bands come back 0, matching the reference's
    * `sumnarm` (`2.:34` — R `sum(na.rm=TRUE)` of all-NA is 0).
    */
  def sumBands(weeks: Column, maxBands: Int): Column =
    array((1 to maxBands).map { i =>
      coalesce(sum(try_element_at(weeks, lit(i))), lit(0L))
    }: _*)

  /** Running (cumulative) sum of a histogram array — slot i of the result
    * holds `sum(weeks[1..i+1])`. Mirrors `cumsum` at `2.:243-248`. */
  def cumulative(weeks: Column): Column =
    aggregate(
      weeks,
      struct(lit(0L).as("run"), array().cast("array<bigint>").as("out")),
      (acc, x) => {
        val run = acc.getField("run") + coalesce(x, lit(0L))
        struct(run.as("run"), concat(acc.getField("out"), array(run)).as("out"))
      },
      acc => acc.getField("out"))

  /** Histogram quantile in *band index* units, reference semantics
    * (`2.:243-249`): answer = min{w : cum[w] >= q*total} - 1, i.e. the
    * lower bound in weeks of the band containing the target mass.
    *
    * Because `cum` is monotone, that equals the COUNT of bands with
    * cum < q*total — a single codegen'd `filter`+`size` pass, no
    * positional search. Returns null on an empty/zero histogram.
    */
  def quantile(cum: Column, total: Column, q: Double): Column = {
    val target = total.cast("double") * lit(q)
    when(total.isNull || total <= 0, lit(null).cast("bigint"))
      .otherwise(size(filter(cum, c => c.cast("double") < target)).cast("bigint"))
  }

  /** Convenience: quantile straight from the (non-cumulative) histogram. */
  def histogramQuantile(weeks: Column, total: Column, q: Double): Column =
    quantile(cumulative(weeks), total, q)

  /** Count of patients waiting <= `band` weeks = cum[band]
    * (`2.:254-256`); clamped for short arrays (pre-2021 eras). */
  def countAtOrBelow(cum: Column, band: Int): Column =
    coalesce(try_element_at(cum, lit(band)), try_element_at(cum, size(cum)))

  /** Count waiting more than `band` weeks = total - cum[band]
    * (`2.:256-257`). `total` may exceed the band sum (unknown clock
    * starts, `2.:189-228`) — the reference subtracts from the row total. */
  def countAbove(cum: Column, total: Column, band: Int): Column =
    total - countAtOrBelow(cum, band)

  /** Rate as a percentage rounded to 1 dp with R's half-to-even rounding
    * (`round(x, 1)` at `2.:258-261` — R rounds half-to-even, so `bround`,
    * not Spark's half-away-from-zero `round`; SURVEY §7.4-2). */
  def rate(numer: Column, denom: Column): Column =
    when(denom.isNull || denom <= 0, lit(null).cast("double"))
      .otherwise(bround(numer.cast("double") * lit(100.0) / denom.cast("double"), 1))

  /** [[rate]] scaled to tenths-of-a-percent as a BIGINT (261 = 26.1%).
    * Rounded doubles have no exact binary representation, so two engines
    * rounding the same value can emit doubles 1 ulp apart — an
    * integer-scaled output is bit-exact across engines (and cheaper to
    * shuffle/store at 100 TB than a double it would round-trip through).
    * Mirrors DuckDB `CAST(round_even(100.0*n/d * 10, 0) AS BIGINT)`. */
  def rateX10(numer: Column, denom: Column): Column =
    when(denom.isNull || denom <= 0, lit(null).cast("bigint"))
      .otherwise(bround(numer.cast("double") * lit(100.0) / denom.cast("double")
        * lit(10.0), 0).cast("bigint"))

  /** Small-number suppression (`2.:233`, `2.:277-298`): statistics are
    * nulled when the eligible total is below `minTotal` (20 in the
    * reference). */
  def suppress(stat: Column, eligibleTotal: Column, minTotal: Int = 20): Column =
    when(eligibleTotal.isNotNull && eligibleTotal >= minTotal, stat)
      .otherwise(lit(null))
}
