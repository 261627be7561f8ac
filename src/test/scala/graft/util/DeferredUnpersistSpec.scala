package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The deferred-cache contract behind the lazy-serving trainers: the
  * cache survives until the RETURNED plan is consumed — interleaved
  * unrelated actions must not evict it (the r10 session-global
  * finding: eviction degraded the serve to the measured 4-10x
  * recompute) — then drops (the r9 session-lifetime storage-leak
  * finding). A never-consumed plan still frees its caches after the
  * fallback action budget. */
class DeferredUnpersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cachedRddCount(): Int =
    spark.sparkContext.getPersistentRDDs.size

  private def awaitCached(expected: Int, what: String): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    // QueryExecutionListener fires on the async listener bus
    while (cachedRddCount() != expected &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cachedRddCount() == expected, what)
  }

  /** Let in-flight listener-bus events drain so an assertion about
    * "nothing fired" is meaningful (the bus is private API — a fixed
    * settle window is enough at this event volume). */
  private def drainListenerBus(): Unit = Thread.sleep(500)

  test("plan-scoped: unrelated actions leave the cache alone; the " +
      "consuming action (even a derived plan) drops it") {
    import spark.implicits._
    spark.catalog.clearCache()
    awaitCached(0, "baseline should be cache-free")
    val cached = Seq(1, 2, 3).toDF("x").cache()
    cached.count() // materialize
    assert(cachedRddCount() == 1)
    val serve = cached.groupBy(col("x") % 2).agg(sum("x").as("s"))
    DeferredUnpersist.afterConsumed(spark, serve, cached)
    // interleaved UNRELATED actions: far fewer than the fallback
    // budget — the cache must survive every one of them
    (1 to 3).foreach(i => Seq(i).toDF("y").count())
    drainListenerBus()
    assert(cachedRddCount() == 1,
      "unrelated actions must not evict the training cache")
    // the consumer arrives as a DERIVED plan (filter on top of the
    // serve) — containment, not equality, must match it
    assert(serve.filter(col("s") > 0).count() > 0)
    awaitCached(0, "cache should drop after the consuming action")
  }

  test("fallback: a never-consumed serve plan still frees its caches " +
      "after the action budget (leak bound)") {
    import spark.implicits._
    spark.catalog.clearCache()
    awaitCached(0, "baseline should be cache-free")
    val cached = Seq(4, 5).toDF("x").cache()
    cached.count()
    assert(cachedRddCount() == 1)
    val serve = cached.agg(sum("x")) // never consumed
    DeferredUnpersist.afterConsumed(spark, serve, cached)
    (1 to DeferredUnpersist.FallbackAfterActions + 1)
      .foreach(i => Seq(i).toDF("z").count())
    awaitCached(0, "cache should drop via the fallback budget")
  }

  test("trained-IVF serving leaves no cached training state behind") {
    spark.catalog.clearCache()
    awaitCached(0, "baseline should be cache-free")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val topk = graft.similarity.Similarity.ivfTopKQuantized(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, iters = 1)
    assert(topk.count() > 0)
    awaitCached(0, "training cache should drop after the serve")
  }

  test("trained-IVF cache survives an interleaved unrelated action " +
      "between training and the serve's first consumption") {
    import spark.implicits._
    spark.catalog.clearCache()
    awaitCached(0, "baseline should be cache-free")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val topk = graft.similarity.Similarity.ivfTopKQuantized(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, iters = 1)
    // the bench/notebook shape: something else runs first
    Seq(1).toDF("w").count()
    drainListenerBus()
    assert(cachedRddCount() > 0,
      "interleaved action must not evict the training cache")
    assert(topk.count() > 0)
    awaitCached(0, "training cache should drop after the serve")
  }
}
