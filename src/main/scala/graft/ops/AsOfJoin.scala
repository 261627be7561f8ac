package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row `(key, t)`, attach the
  * LATEST right row with the same key and `t_right <= t` (equality
  * included), or nulls when no such row exists (left-join semantics).
  * The canonical event-enrichment join (DuckDB/kdb `ASOF JOIN`,
  * pandas `merge_asof`); absent from both the reference (SURVEY.md §2
  * J8) and Spark's built-in join menu.
  *
  * Spark-first restatement — compose, don't custom-plan: a naive
  * translation is an inequality join (`l.key = r.key AND r.t <= l.t`
  * + keep max `r.t`), which Spark executes as a broadcast-nested-loop
  * or cartesian product — O(|L|·|R|) per key and a scale killer. This
  * implementation is ONE hash shuffle + ONE sort, the sort-merge-as-of
  * shape:
  *
  *   1. union left and right rows by key/time, tagged `__side`
  *      (right = 0, left = 1 — so at equal times the right row sorts
  *      FIRST and equality matches are visible to the left row);
  *   2. one window over `partitionBy(key).orderBy(time, __side)` with
  *      a growing frame (unbounded preceding → current row):
  *      `last(right_payload_struct, ignoreNulls)` carries the most
  *      recent right row forward — Spark evaluates growing frames
  *      incrementally, so the scan is O(n) per partition after sort;
  *   3. keep left rows, unpack the struct.
  *
  * The payload rides in ONE struct (non-null for every right row), so
  * right rows whose payload FIELDS are null still win the as-of race —
  * a bare `last(payload, ignoreNulls)` would skip them and resurrect
  * an older row's value.
  *
  * At 100 TB both sides shuffle once on the key — the same cost as any
  * key-partitioned join of the two tables — and no row ever expands;
  * skewed keys respond to the usual salting (split the window's key by
  * a time-bucket salt, as-of join within salt, then one cheap repair
  * pass for rows whose match crosses a salt boundary).
  *
  * `tolerance`: when set, a match older than `t - tolerance` is
  * discarded (nulls out, row kept) — `merge_asof(tolerance=)`
  * semantics.
  *
  * NULL CONTRACT (equi-join/DuckDB-ASOF semantics — nulls never
  * match): right rows with a null time or any null key are discarded
  * before the race (they could otherwise win it — a null time sorts
  * first but its payload struct carrier is non-null); left rows with
  * null keys or a null time are KEPT and take the no-match path (null
  * payload), like an outer join's null-key rows.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (must exist in
    *   `right`); emitted under the same names, so they must not clash
    *   with left column names
    * @param rightTimeOut name for the matched right row's timestamp
    *   column in the output */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTimeOut: String = "matched_time",
      tolerance: Option[Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    require(!(payload :+ rightTimeOut).exists(leftCols.contains),
      "payload/rightTimeOut names must not clash with left columns")

    // nulls never match: see the null contract above. Left null-key
    // rows need no special handling — with null-key right rows gone,
    // their window partition contains no right rows and the match
    // column stays null.
    val rValid = right.filter(
      (col(rightTime) +: keyCols.map(col)).map(_.isNotNull).reduce(_ && _))
    val rTagged = rValid.select(
      keyCols.map(col) :+
        col(rightTime).as("__t") :+
        lit(0).as("__side") :+
        struct(col(rightTime).as(rightTimeOut) +: payload.map(col): _*)
          .as("__r"): _*)
    val lTagged = left.select(
      leftCols.map(col) :+
        col(leftTime).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(rTagged.schema("__r").dataType).as("__r"): _*)

    // union by name, null-filling the columns the other side lacks
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTol = tolerance match {
      case Some(tol) => col("__m").isNotNull &&
        col(s"__m.$rightTimeOut") >= col("__t") - tol
      case None => col("__m").isNotNull
    }
    val outPayload = (rightTimeOut +: payload).map { c =>
      when(inTol, col(s"__m.$c")).as(c)
    }
    matched.select(leftCols.map(col) ++ outPayload: _*)
  }
}
