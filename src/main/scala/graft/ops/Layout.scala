package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: cluster a table on a space-filling curve so
  * columnar min/max statistics prune MULTI-dimensional predicates.
  *
  * A table sorted on one column skips row groups for that column only;
  * a 100 TB fact queried by (key range x time range x tenant) needs
  * locality in EVERY queried dimension. Interleaving the dimensions'
  * bits (Morton / Z-order — the scheme behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) gives each parquet file a tight min/max envelope on
  * every participating column at once, so a predicate on ANY of them
  * prunes most files before a byte is read. The curve value is plain
  * bit arithmetic (unrolled shifts — shift amounts must be literals),
  * so it rides inside whole-stage codegen like any other projection.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of each
    * column. Columns must be NON-NEGATIVE integers already scaled to
    * the `bits`-bit range — callers bucket raw values first (`pmod`,
    * width division, or a rank); equal-width buckets keep the curve's
    * locality guarantee honest. `bits * cols.size` must fit a signed
    * long (<= 63). Bit j of column c lands at curve bit
    * `i * cols.size + j` — the standard round-robin interleave. */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderValue: at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"zorderValue: $bits bits x ${cols.size} cols must stay within a long")
    val k = cols.size
    val parts = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + j)
    parts.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered on `zcol` into `numFiles` range-partitioned,
    * internally-sorted parquet files. `repartitionByRange` samples the
    * curve value for balanced cut points (one shuffle); the
    * within-partition sort keeps every ROW GROUP's envelope tight, not
    * just every file's. The helper column is dropped after the sort —
    * a narrow projection that preserves row order — so the stored
    * schema is the caller's. */
  def clusteredWrite(df: DataFrame, path: String, zcol: Column,
      numFiles: Int): Unit =
    df.withColumn("__z", zcol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
