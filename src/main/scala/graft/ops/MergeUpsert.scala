package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) into a partitioned parquet lake by
  * PARTITION-SCOPED rewrite — the revision idiom behind the
  * reference's monthly re-publications (a corrected month replaces the
  * prior month's rows; see `1b.:169-179`) generalized to row-level
  * keys: updates override matching keys, unmatched keys insert, and
  * every partition the update batch does NOT touch is never read,
  * never shuffled, and never rewritten.
  *
  * Scale shape: the update batch's distinct partition values semi-join
  * the base scan (partition pruning keeps untouched data on disk),
  * the keep-latest window shuffles ONLY the touched partitions' rows
  * on the key, and the result is staged then swapped per-partition —
  * at 100 TB a merge of one month into a decade of history costs one
  * month of IO, not ten years. Plain parquet + directory swap stands
  * in for a table format's atomic commit; the swap is the documented
  * non-transactional boundary (readers racing the swap can see a
  * partition mid-replace, exactly like the reference's file drops).
  *
  * SCOPE: this is the op for PUBLIC plain-parquet lakes, where the
  * directory layout is the interface (any engine reads the table
  * path directly — the reference's published-artifact shape). The
  * engine's own mutable stores (dedup fingerprint/LSH stores, the
  * cluster table's labels) use [[TableLayout]] instead: same
  * partition-scoped IO, but rewrites land in new snapshot
  * generations behind an atomic manifest commit, so engine readers
  * racing a rewrite keep a complete snapshot — the reader isolation
  * a raw directory swap cannot give.
  */
object MergeUpsert {

  /** Merge `updates` into the partitioned parquet table at `path`.
    * `versionCol` decides the winner per key (strictly greater wins;
    * versions must be distinct per key — base rows at version v and an
    * update at the same v would tie-break arbitrarily, so don't).
    * `updates` must carry the table's full schema, and its types pin
    * the read-back schema (so numeric-LOOKING string partition values
    * like "01" survive as written instead of being inferred to int 1
    * and re-rendered into a different directory name).
    *
    * PRECONDITION — keys do not move between partitions: an update
    * whose key exists in the base under a DIFFERENT partition value
    * leaves the old row in place (that partition is untouched by
    * design), yielding two live rows for the key. Partition the table
    * on a key-derived or immutable column (month of a fixed event
    * date, tenant, shard-of-key); a merge that must relocate keys is a
    * rewrite of both partitions, not a partition-scoped upsert. */
  def mergeByKey(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], versionCol: String,
      partitionCol: String): Unit = {
    val touched = updates.select(partitionCol).distinct()
    // base scan restricted to touched partitions BEFORE any shuffle —
    // the join key is the partition column, so the filter reaches the
    // scan as partition pruning. Null-safe: a null partition value is
    // a legal directory (__HIVE_DEFAULT_PARTITION__), and a plain
    // equi-semi-join would silently drop the base's null-partition
    // rows while the swap still replaced their directory.
    val base = spark.read.schema(updates.schema).parquet(path)
      .join(touched.withColumnRenamed(partitionCol, "__tp"),
        col(partitionCol) <=> col("__tp"), "left_semi")
    val all = base.unionByName(updates)
    val merged = all
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    replacePartitions(spark, path, merged, partitionCol, touched)
  }

  /** Rewrite EXACTLY the partitions named by `touched` with the rows
    * of `replacement` (whose `partitionCol` values must be a subset of
    * `touched`) — the shared partition-scoped commit under
    * [[mergeByKey]] and the retraction paths. A touched partition with
    * NO replacement rows is DELETED (that is how retraction empties a
    * bucket; a plain staged swap would silently leave the old rows,
    * since partitionBy never writes an empty directory).
    *
    * Stage-then-swap per partition, rename-to-tombstone ordering: at
    * every instant some on-disk copy of each partition exists, and any
    * failed filesystem verb halts with the staging dir preserved (it
    * may hold the only copy of not-yet-swapped partitions). */
  def replacePartitions(spark: SparkSession, path: String,
      replacement: DataFrame, partitionCol: String,
      touched: DataFrame): Unit = {
    // collect the touched values FIRST: the touched plan (like the
    // replacement plan) may read the very path this method is about to
    // swap — re-executing it after the renames would read post-swap
    // state and mis-name the emptied partitions
    // the emptied-partition deletion below renders directory names via
    // toString + escapePathName, which matches Spark's own rendering
    // for string and integral partition values only (timestamps/dates/
    // decimals render differently) — reject the rest loudly instead of
    // silently failing to delete an emptied partition
    require(Set("string", "int", "bigint", "smallint", "tinyint")
        .contains(replacement.schema(partitionCol).dataType.simpleString),
      s"replacePartitions: partition column '$partitionCol' must be " +
        "string or integral (directory-name rendering for other types " +
        s"diverges from Spark's), got " +
        replacement.schema(partitionCol).dataType.simpleString)
    val touchedVals = touched.distinct().collect().map(_.get(0))
    // stage-then-swap: Spark refuses to overwrite a path it is reading
    // in the same plan (correctly — the scan would race the delete),
    // so the merged partitions land in a staging dir and move into
    // place with per-partition renames. The rename list is
    // partition-count-sized driver work, not data movement.
    val staging = new Path(path + "-staging-" +
      java.util.UUID.randomUUID.toString)
    // co-locate each partition's rows before the partitioned write:
    // the keep-latest window leaves a month's rows scattered over
    // every key-hash task, and an unrepartitioned partitionBy write
    // then emits one file per (task x partition) — a small-file
    // explosion that multiplies open/close cost here and file-listing
    // cost on every later scan. One hash shuffle on the partition
    // column makes it ~one file per partition (a hot partition that
    // overflows one task's memory would call for salting this
    // repartition by a file-count divisor — not needed at
    // month-partition grain).
    replacement.repartition(col(partitionCol)).write.mode("overwrite")
      .partitionBy(partitionCol).parquet(staging.toString)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // swap via RENAME-TO-TOMBSTONE (target -> .target.old, staging ->
    // target, delete .old): at every instant some on-disk copy of the
    // partition exists — the old delete-then-rename order had a crash
    // window where the only copy sat in the staging dir. The tombstone
    // name is DOT-PREFIXED so Hadoop/Spark listings ignore it (a
    // `month=...old` sibling would be discovered as a phantom
    // partition value by a concurrent reader). Every filesystem verb's
    // return value is checked: a false return (permission, non-empty
    // semantics, eventual-consistency store) must halt the swap with
    // the staging dir PRESERVED — it holds the only copy of the
    // not-yet-swapped merged partitions, so deleting it would leave
    // the table half-merged with no recovery path. Errors name both
    // dirs for manual completion.
    val staged = fs.listStatus(staging)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    staged.foreach { st =>
        val target = new Path(path, st.getPath.getName)
        val tomb = new Path(path, "." + st.getPath.getName + ".old")
        // a leftover tombstone from a previous crashed swap: the live
        // target (if any) supersedes it — clear it before swapping
        if (fs.exists(tomb))
          require(fs.delete(tomb, true),
            s"replacePartitions: could not clear leftover tombstone $tomb — " +
              s"staging preserved under $staging")
        val hadTarget = fs.exists(target)
        if (hadTarget)
          require(fs.rename(target, tomb),
            s"replacePartitions: could not tombstone $target — " +
              s"staging preserved under $staging")
        require(fs.rename(st.getPath, target),
          s"replacePartitions: failed to move ${st.getPath} into place — " +
            s"previous data under $tomb, remaining merged partitions " +
            s"preserved under $staging")
        if (hadTarget)
          require(fs.delete(tomb, true),
            s"replacePartitions: partition swapped but tombstone $tomb " +
              s"survives — delete it manually (staging: $staging)")
      }
    // touched partitions the replacement left EMPTY: partitionBy never
    // writes an empty dir, so the swap loop above never visited them —
    // delete the live dirs, or retraction would leave the old rows
    val stagedNames = staged.map(_.getPath.getName).toSet
    touchedVals.foreach { v =>
      val rendered =
        if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v.toString)
      val name = s"$partitionCol=$rendered"
      if (!stagedNames.contains(name)) {
        val target = new Path(path, name)
        if (fs.exists(target))
          require(fs.delete(target, true),
            s"replacePartitions: could not delete emptied partition " +
              s"$target — staging preserved under $staging")
      }
    }
    require(fs.delete(staging, true),
      s"replacePartitions: all partitions swapped but the empty " +
        s"staging dir $staging could not be removed — delete it manually")
  }

}
