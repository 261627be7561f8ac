package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types._

/** Structured-Streaming versions of the event analytics — the
  * incremental twins of [[graft.queries.EventQueries]]. The reference
  * is pure batch with a manual monthly-increment idiom (`1b.:169-179`);
  * this module is the `Trigger.AvailableNow` / drop-folder shape that
  * idiom maps to (SURVEY.md §2.10), plus genuine event-time operators
  * (watermarked windows, stateful sessionization) for the `events`
  * stream.
  */
object EventStreams {

  /** Raw parquet schema of the events table, parameterized on the ts
    * encoding — driver data generations have shipped both INT64 nanos
    * (read with nanosAsLong; Spark rejects TIMESTAMP(NANOS) natively)
    * and TIMESTAMP(MICROS) NTZ. A file-source stream REQUIRES an
    * explicit schema, and forcing the wrong ts type silently
    * misreads the epoch scale — so [[readEvents]] peeks the real type
    * off the already-staged files instead of assuming. */
  def rawSchemaFor(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, tsUs: Long)

  /** `sum_value_c` is exact integer cents (per-event half-even round of
    * value*100, then summed) — double accumulation would drift with
    * arrival order, breaking the streaming/batch equivalence contract. */
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, sum_value_c: Long, closed: Boolean)

  // public: encoder codegen needs constructor access on state classes
  final case class SessionState(idx: Long, nEvents: Long,
      startUs: Long, lastUs: Long, sumValueC: Long)

  /** Spark `bround(x*100, 0)` semantics on the JVM side (HALF_EVEN over
    * the canonical decimal repr of the double) — keeps stateful-kernel
    * sums hash-equal to expression-computed batch results. */
  def cents(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 100.0)
      .setScale(0, java.math.RoundingMode.HALF_EVEN).longValue

  /** File-source stream over a drop folder (or a single parquet file)
    * of events, normalized to the `ts_ns` + microsecond-`ts` contract
    * ([[graft.Tables.normalizeEventTs]]). The drop folder must already
    * hold at least one file when the stream is DEFINED (every fixture
    * stages first): a one-off batch peek supplies the ts encoding for
    * the forced stream schema. */
  def readEvents(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(path).schema("ts").dataType
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"readEvents: could not peek the event schema from '$path' — " +
            "the drop folder must hold at least one staged parquet file " +
            "BEFORE the stream is defined (stage fixtures first, then " +
            "build the stream)", e)
      }
    val reader = spark.readStream.schema(rawSchemaFor(tsType))
    graft.Tables.normalizeEventTs(
      maxFilesPerTrigger.fold(reader)(m =>
          reader.option("maxFilesPerTrigger", m.toString))
        .parquet(path))
  }

  /** Watermarked tumbling-window counts per event type. Event-time,
    * late data beyond `watermark` dropped; state is bounded by
    * watermark horizon — the 100 TB/day streaming shape. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact integer-cents sum — matches the batch twin's fixed-point
      // contract (double sums drift with arrival order)
      .agg(count(lit(1)).as("n"),
        sum(bround(col("value") * lit(100.0), 0).cast("bigint")).as("sum_value_c"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** Stateful gap sessionization via flatMapGroupsWithState: sessions
    * close after `gapUs` of inactivity. Within a batch, a group's
    * iterator is NOT time-ordered — events are sorted in the state
    * function (bounded by per-user-per-batch volume, not history:
    * cross-batch continuity lives in the GroupState). Emits closed
    * sessions; the open tail stays in state. */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000 * 1000)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          evs.foreach { e =>
            if (cur == null) {
              cur = SessionState(1L, 1L, e.tsUs, e.tsUs, cents(e.value))
            } else if (e.tsUs - cur.lastUs > gapUs) {
              out += Session(userId, cur.idx, cur.nEvents, cur.startUs,
                cur.lastUs, cur.sumValueC, closed = true)
              cur = SessionState(cur.idx + 1, 1L, e.tsUs, e.tsUs, cents(e.value))
            } else {
              cur = cur.copy(nEvents = cur.nEvents + 1, lastUs = e.tsUs,
                sumValueC = cur.sumValueC + cents(e.value))
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }

  /** Watermarked STREAM-STREAM inner join — the attribution join:
    * every purchase paired with each view by the same user in the
    * `horizonUs` before it (equality included). The canonical
    * two-stream stateful join: both sides buffer in keyed state, and
    * Spark derives each side's EVICTION bound from the time-range
    * condition + watermarks — a buffered view is dropped once the
    * watermark guarantees no future purchase can reach back to it
    * (`v_ts < wm - horizon`), so state is bounded by the horizon, not
    * the stream's history. That is the 100 TB/day shape: without the
    * range condition Spark would have to buffer both streams forever.
    *
    * Inner-join rows emit EAGERLY (no watermark wait — only outer
    * sides delay for null emission), so an AvailableNow replay yields
    * the complete pair set. `withWatermark` is a planning no-op in
    * batch, so the SAME function is its own batch twin — which is what
    * the q_stream_join oracle checks.
    *
    * @param wmDelay extra watermark slack on top of the horizon.
    *   Correctness under replay needs arrivals no later than
    *   `wmDelay` after the running max event time; the ordered-drop
    *   fixtures replay in event-time order, where any slack works. */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
      horizonUs: Long, wmDelay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", wmDelay)
    val v = views
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", wmDelay)
    p.join(v,
        col("user_id") === col("v_user_id") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL '$horizonUs' MICROSECOND"))
      .select(col("user_id"), col("purchase_id"),
        unix_micros(col("p_ts")).as("ts_us"),
        col("view_id"), unix_micros(col("v_ts")).as("view_ts_us"))
  }

  /** Batch -> typed events (for feeding [[sessionize]] in tests or
    * backfills: the same code runs batch and streaming). */
  def toTypedEvents(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr("ts_ns div 1000").as("tsUs"))
      .as[Event]
  }
}
