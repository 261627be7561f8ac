package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deferred cache cleanup for functions that train EAGERLY off a
  * cached relation but return a LAZY plan that still reads it
  * (trained-IVF / IVFADC serving): unpersisting before return
  * recomputes the whole corpus-side chain inside the serve (measured
  * 0.6 s -> 5.5-8.5 s on the trained-IVF gate), while never
  * unpersisting accumulates executor storage for the session lifetime
  * (the r9 advisory finding).
  *
  * PLAN-SCOPED (the r10 findings): the registered listener fires when
  * a completed action's plan actually CONTAINS the returned serve
  * plan — not on the session's next action of any kind. That closes
  * two holes of the next-action version:
  *   - an interleaved unrelated action (bench/notebook sessions
  *     constantly) evicted the training cache before the serve
  *     consumed it, silently restoring the measured 4-10x recompute;
  *   - the ExecutionListener bus is ASYNC, so a still-in-flight
  *     completion event from the training collects themselves could
  *     be delivered to the freshly registered listener and fire it
  *     before the serve ran at all.
  * The training collects ran on the CACHED relations, whose plans are
  * strict subtrees of the serve plan — they can never match the
  * serve-plan containment test, so in-flight training events are
  * structurally inert here.
  *
  * LEAK BOUND: a serve plan that is never consumed must not pin
  * executor storage forever, so after [[FallbackAfterActions]]
  * non-matching completed actions the listener fires anyway — the
  * worst case degrades to one recompute (the old behavior, never a
  * wrong result). */
object DeferredUnpersist {

  /** Unmatched completed actions tolerated before the unconditional
    * fallback fire — generous enough to ride out in-flight training
    * events plus a few interleaved queries. */
  val FallbackAfterActions = 8

  /** Unpersist `caches` after the first completed action whose plan
    * contains `consumer`'s logical plan (or after
    * [[FallbackAfterActions]] unrelated actions, as the leak bound).
    * One-shot: the listener unregisters itself after firing. */
  def afterConsumed(ss: SparkSession, consumer: DataFrame,
      caches: DataFrame*): Unit =
    afterConsumedBudget(ss, consumer, FallbackAfterActions, caches: _*)

  /** [[afterConsumed]] with a caller-set action budget: pipelines that
    * interleave MANY eager bookkeeping actions between building a plan
    * and consuming it (the cluster-table ingest runs ~10 store-probe /
    * bloom / commit actions before the CC edge collect) need a budget
    * those unrelated actions cannot exhaust — an early fallback fire
    * silently restores the measured recompute the cache exists to
    * avoid. The leak bound still holds, just wider. */
  def afterConsumedBudget(ss: SparkSession, consumer: DataFrame,
      budget: Int, caches: DataFrame*): Unit = {
    val lm = ss.listenerManager
    val cs = caches.toSeq
    val target = consumer.queryExecution.analyzed
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      private def done(): Unit = if (fired.compareAndSet(false, true)) {
        cs.foreach { c =>
          try c.unpersist()
          catch { case scala.util.control.NonFatal(_) => () }
        }
        lm.unregister(listener)
      }
      private def consumedOrExpired(qe: QueryExecution): Unit = {
        val matches =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case scala.util.control.NonFatal(_) => true }
        if (matches || misses.incrementAndGet() >= budget)
          done()
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = consumedOrExpired(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = consumedOrExpired(qe)
    }
    lm.register(listener)
  }
}
