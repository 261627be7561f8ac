package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — left points `(key, t)` joined to
  * right intervals `(key, start, end)` with `start <= t <= end`
  * (closed ends, SQL `BETWEEN`). Spark plans the naive formulation
  * (`l.key = r.key AND t BETWEEN start AND end`) as a hash join on the
  * key whose every key-group degenerates to a nested loop — O(|P|·|I|)
  * per key once keys are hot, and a cartesian product if the key
  * predicate is absent.
  *
  * Scale path: BINNED equi-join. Pick a bin width `w`; each point
  * lands in bin `floor(t / w)`, each interval replicates to every bin
  * it covers (`sequence(floor(start/w), floor(end/w))` — bounded by
  * `len/w + 1` rows). The join is then a plain EQUI-join on
  * `(key, bin)` + an exact containment post-filter. Every
  * (point, interval) match meets in EXACTLY one bin — the point's —
  * so no dedup is needed. One shuffle each side, hash-joinable,
  * AQE/skew-salting applies as to any equi-join.
  *
  * `w` trades replication against selectivity: intervals expand by
  * `~len/w`, points never expand, and the post-filter discards
  * same-bin non-matches. Choose `w` near the TYPICAL interval length
  * (replication factor ~2) unless intervals are wildly mixed-scale —
  * then partition the interval table by magnitude and run one binned
  * join per decade (composition left to the caller).
  *
  * Times are LONGs (epoch micros or any monotone encoding — callers
  * cast timestamps with `unix_micros`); negative values bin correctly
  * via floor-division semantics.
  */
object RangeJoin {

  /** @param maxBinsPerInterval loud per-row guard: a single degenerate
    *   interval spanning more bins than this (bad data, or a binWidth
    *   far below the interval scale) would otherwise materialize a
    *   huge `sequence()` array per row — task OOM with no explanation.
    *   The failure message says which knob to turn. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], timeCol: String, startCol: String,
      endCol: String, binWidth: Long,
      maxBinsPerInterval: Long = 1000000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    // non-key columns present on both sides would come out ambiguous —
    // same contract as AsOfJoin's payload-name check
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key columns on both sides would be ambiguous in the " +
        s"output: ${overlap.mkString(", ")} — rename or drop them first")
    // floor division for possibly-negative longs in EXACT integer
    // arithmetic end-to-end: subtract the non-negative remainder, then
    // integral-divide (`div`). No double round-trip — a double floor
    // division is only exact for |t| < 2^53, which generic long
    // encodings (not epoch micros) can exceed and silently mis-bin.
    def floorDiv(c: org.apache.spark.sql.Column) = {
      val l = c.cast("long")
      call_function("div", l - pmod(l, lit(binWidth)), lit(binWidth))
    }
    val p = points.withColumn("__bin", floorDiv(col(timeCol)))
    val startBin = floorDiv(col(startCol))
    val endBin = floorDiv(col(endCol))
    val guardedEnd = when(endBin - startBin >= lit(maxBinsPerInterval),
        raise_error(format_string(
          s"RangeJoin: interval [%s, %s] spans %s bins at binWidth=$binWidth" +
            s" (cap $maxBinsPerInterval) — raise binWidth, split " +
            "mixed-scale intervals by magnitude, or raise maxBinsPerInterval",
          col(startCol), col(endCol), endBin - startBin + lit(1))))
      .otherwise(endBin)
    val i = intervals.withColumn("__bin", explode(sequence(startBin, guardedEnd)))
    p.join(i, keyCols :+ "__bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin")
  }
}
