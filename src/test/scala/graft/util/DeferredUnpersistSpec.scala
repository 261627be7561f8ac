package graft.util

import org.apache.spark.graft.ListenerBusSync
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The deferred-cache contract behind the lazy-serving trainers: the
  * cache survives until the RETURNED plan is consumed — interleaved
  * unrelated actions must not evict it (the r10 session-global
  * finding: eviction degraded the serve to the measured 4-10x
  * recompute) — then drops (the r9 session-lifetime storage-leak
  * finding). A never-consumed plan still frees its caches after the
  * fallback action budget.
  *
  * DETERMINISM (the r13 full-suite failure): the suite shares one
  * SparkSession with every other suite, and `localCheckpoint`ed RDDs
  * from earlier suites (connectedComponents, BPE) linger in
  * `getPersistentRDDs` until the ContextCleaner GCs them — which
  * `clearCache()` does NOT do and which is timing-dependent. So the
  * assertions count only RDDs persisted DURING the test (set
  * difference against a baseline snapshot; suites run sequentially in
  * the forked JVM, so no new alien ids can appear mid-test), and
  * listener-bus settling uses a real drain
  * (`ListenerBusSync.drain`), not fixed sleeps. */
class DeferredUnpersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Ids persisted before the test started (alien: other suites'
    * leftovers, e.g. un-GC'd localCheckpoints). They may disappear
    * mid-test (ContextCleaner); they can never be re-added. */
  private def snapshotBaseline(): Set[Int] = {
    spark.catalog.clearCache()
    drainListenerBus()
    spark.sparkContext.getPersistentRDDs.keySet.toSet
  }

  private def newCachedCount(base: Set[Int]): Int =
    spark.sparkContext.getPersistentRDDs.keySet.count(!base.contains(_))

  private def awaitCached(base: Set[Int], expected: Int,
      what: String): Unit = {
    drainListenerBus()
    // ContextCleaner-driven removals (blocking=false unpersists) may
    // lag the bus drain by a beat; spin briefly for those only.
    val deadline = System.currentTimeMillis() + 30000
    while (newCachedCount(base) != expected &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(newCachedCount(base) == expected, what)
  }

  /** Deterministic: every completed action's listener side effects
    * (including DeferredUnpersist's unpersist) have run on return. */
  private def drainListenerBus(): Unit =
    ListenerBusSync.drain(spark.sparkContext)

  test("plan-scoped: unrelated actions leave the cache alone; the " +
      "consuming action (even a derived plan) drops it") {
    import spark.implicits._
    val base = snapshotBaseline()
    val cached = Seq(1, 2, 3).toDF("x").cache()
    cached.count() // materialize
    assert(newCachedCount(base) == 1)
    val serve = cached.groupBy(col("x") % 2).agg(sum("x").as("s"))
    DeferredUnpersist.afterConsumed(spark, serve, cached)
    // interleaved UNRELATED actions: far fewer than the fallback
    // budget — the cache must survive every one of them
    (1 to 3).foreach(i => Seq(i).toDF("y").count())
    drainListenerBus()
    assert(newCachedCount(base) == 1,
      "unrelated actions must not evict the training cache")
    // the consumer arrives as a DERIVED plan (filter on top of the
    // serve) — containment, not equality, must match it
    assert(serve.filter(col("s") > 0).count() > 0)
    awaitCached(base, 0, "cache should drop after the consuming action")
  }

  test("fallback: a never-consumed serve plan still frees its caches " +
      "after the action budget (leak bound)") {
    import spark.implicits._
    val base = snapshotBaseline()
    val cached = Seq(4, 5).toDF("x").cache()
    cached.count()
    assert(newCachedCount(base) == 1)
    val serve = cached.agg(sum("x")) // never consumed
    DeferredUnpersist.afterConsumed(spark, serve, cached)
    (1 to DeferredUnpersist.FallbackAfterActions + 1)
      .foreach(i => Seq(i).toDF("z").count())
    awaitCached(base, 0, "cache should drop via the fallback budget")
  }

  test("trained-IVF serving leaves no cached training state behind") {
    val base = snapshotBaseline()
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val topk = graft.similarity.Similarity.ivfTopKQuantized(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, iters = 1)
    assert(topk.count() > 0)
    awaitCached(base, 0, "training cache should drop after the serve")
  }

  test("trained-IVF cache survives an interleaved unrelated action " +
      "between training and the serve's first consumption") {
    import spark.implicits._
    val base = snapshotBaseline()
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val topk = graft.similarity.Similarity.ivfTopKQuantized(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, iters = 1)
    // the bench/notebook shape: something else runs first
    Seq(1).toDF("w").count()
    drainListenerBus()
    assert(newCachedCount(base) > 0,
      "interleaved action must not evict the training cache")
    assert(topk.count() > 0)
    awaitCached(base, 0, "training cache should drop after the serve")
  }
}
