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

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], timeCol: String, startCol: String,
      endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // floor division for possibly-negative longs, in EXACT integer
    // arithmetic (a double-division floor drifts at epoch-micro
    // magnitudes): subtract the non-negative remainder, then the
    // division is exact
    // (l - pmod) is an exact multiple of binWidth, so the double
    // division below is exact (an integer quotient < 2^53 is
    // representable, and IEEE division of exact operands with an
    // exactly-representable true quotient returns it)
    def floorDiv(c: org.apache.spark.sql.Column) = {
      val l = c.cast("long")
      ((l - pmod(l, lit(binWidth))) / lit(binWidth)).cast("long")
    }
    val p = points.withColumn("__bin", floorDiv(col(timeCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(startCol)), floorDiv(col(endCol)))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin")
  }
}
