package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Tombstone-list plumbing the retraction paths share (text index,
  * ANN indexes): filter a relation against a SMALL driver-side id
  * list. Lists are small by the retraction contract — a takedown
  * batch between maintenances, bounded by [[MaxTombstones]]; a larger
  * purge is a rebuild/vacuum, not a tombstone. Small lists compile to
  * an `isin` (codegen'd, no join); larger ones become a broadcast
  * (anti-)join so the filter stays map-side without a giant
  * expression tree. */
private[graft] object Tombstones {

  /** Hard bound on a live tombstone list: past this, the list no
    * longer qualifies as "small metadata" (manifest/meta lines,
    * broadcast filters) and the store owner must fold it out with a
    * vacuum / maintain rebuild instead. */
  val MaxTombstones = 100000

  /** `isin` beyond this many ids builds an expression tree that slows
    * planning; switch to the broadcast join. */
  private val IsinMax = 1024

  /** THE retraction-epoch reset rule, shared by every commit that
    * resets a tombstone list (vacuums, maintain/full rebuilds,
    * publish-over-tombstoned-snapshot): carry the prior epoch and
    * bump it iff a non-empty list is actually being reset — resetting
    * an empty list fences nothing and a bump there would only churn
    * takedown streams into spurious refusals. One definition so the
    * replay fence cannot drift between the text and ANN families. */
  def nextEpoch(prior: Long, tombstones: Seq[_]): Long =
    prior + (if (tombstones.nonEmpty) 1L else 0L)

  private def idsDf(like: DataFrame, idCol: String,
      ids: Seq[Long]): DataFrame = {
    val ss = like.sparkSession
    ss.createDataFrame(
      ss.sparkContext.parallelize(ids.map(Row(_)), 1),
      StructType(Seq(StructField(idCol, LongType, nullable = false))))
  }

  /** Rows of `df` whose `idCol` is NOT in `ids` (no-op on empty).
    * Null ids are KEPT on both branches: a bare `!isin` evaluates to
    * NULL for a null id (row dropped) while `left_anti` keeps it —
    * the isin branch is an optimization and must not change
    * semantics at the threshold. */
  def exclude(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    if (ids.isEmpty) df
    else if (ids.length <= IsinMax)
      df.filter(col(idCol).isNull ||
        !col(idCol).isin(ids.map(java.lang.Long.valueOf): _*))
    else df.join(broadcast(idsDf(df, idCol, ids)), Seq(idCol), "left_anti")

  /** Rows of `df` whose `idCol` IS in `ids` (empty ids → no rows). */
  def restrict(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    if (ids.isEmpty) df.filter(lit(false))
    else if (ids.length <= IsinMax)
      df.filter(col(idCol).isin(ids.map(java.lang.Long.valueOf): _*))
    else df.join(broadcast(idsDf(df, idCol, ids)), Seq(idCol), "left_semi")

  /** The retraction bookkeeping every store shares: ids not already
    * tombstoned, merged list, and the size guard. */
  def merge(existing: Seq[Long], ids: Seq[Long],
      what: String): (Seq[Long], Seq[Long]) = {
    val seen = existing.toSet
    val fresh = ids.distinct.filterNot(seen)
    val all = (existing ++ fresh).sorted
    require(all.length <= MaxTombstones,
      s"$what: tombstone list would reach ${all.length} ids (cap " +
        s"$MaxTombstones) — a purge this large is a vacuum/maintain " +
        "rebuild, not a tombstone batch; fold the list out first")
    (fresh, all)
  }
}
