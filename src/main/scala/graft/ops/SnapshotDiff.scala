package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — derive a change-data-capture feed from two
  * snapshots of the same keyed table (the lakehouse staple when the
  * upstream system only hands over full dumps: yesterday's export vs
  * today's export -> what changed). Every key is classified exactly
  * once:
  *
  *   - `added`     — key only in the new snapshot
  *   - `removed`   — key only in the old snapshot
  *   - `changed`   — key in both, any compare column differs
  *     (null-safe: null -> value and value -> null are changes,
  *     null -> null is not)
  *   - `unchanged` — key in both, all compare columns null-safe equal
  *
  * Scale shape: ONE full-outer shuffle join on the key — no
  * corpus-sized window, no driver state. For a recurring diff over
  * the same huge table, write both snapshots bucketed on the key
  * ([[ScaleOps.writeBucketed]]) and the exchange disappears; the
  * change classification itself is a codegen'd projection. Compare
  * columns should be exact types (int/long/string/date); diffing
  * floats invites ulp-noise "changes" — store money in cents.
  */
object SnapshotDiff {

  /** Per-key change rows: key columns + `change_type` + each compare
    * column as `old_<c>` / `new_<c>`. `unchanged` keys are dropped by
    * default (at 100 TB the diff output should be delta-sized, not
    * snapshot-sized); pass `keepUnchanged = true` for the full audit
    * grid. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], keepUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        col("__in_old"): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        col("__in_new"): _*)
    val anyDiff = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val classified = o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
    if (keepUnchanged) classified
    else classified.where(col("change_type") =!= "unchanged")
  }

  /** APPLY a [[diff]] feed to the old snapshot — the CDC consume step
    * (the batch sibling of the streaming last-writer-wins upsert):
    * removed keys drop, added/changed keys take the feed's `new_`
    * values, untouched keys pass through. Round-trip law (property-
    * tested): `applyDiff(old, diff(old, new)) == new` for any pair of
    * keyed snapshots — the delta-sized default diff is lossless.
    *
    * Scale shape: the feed is delta-sized, the snapshot corpus-sized —
    * one left join of snapshot x feed on the key (the feed side
    * broadcasts when small / AQE decides) plus a union of the feed's
    * additions. Nothing snapshot-sized is windowed or collected. */
  def applyDiff(oldSnap: DataFrame, feed: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "key and compare columns required")
    // a keepUnchanged=true feed carries 'unchanged' rows — they are
    // untouched keys, not changes; without this filter they would be
    // dropped from `kept` and never re-added by `incoming`
    val touched = feed.where(col("change_type") =!= "unchanged")
      .select(keyCols.map(col) :+ col("change_type"): _*)
    val kept = oldSnap
      .join(touched, keyCols, "left")
      .where(col("change_type").isNull) // untouched keys pass through
      .select(oldSnap.columns.map(col): _*)
    val incoming = feed
      .where(col("change_type").isin("added", "changed"))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(s"new_$c").as(c)): _*)
    kept.select((keyCols ++ compareCols).map(col): _*)
      .unionByName(incoming)
  }
}
