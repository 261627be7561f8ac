package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The deferred-cache contract behind the lazy-serving trainers: the
  * cache survives until the returned plan is consumed (so the serve
  * never recomputes the corpus chain — the eager-unpersist version
  * measured 4-10x slower on the trained-IVF gate), then drops (the r9
  * session-lifetime storage-leak finding). */
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

  test("afterNextAction: the cache survives the consumption that needs " +
      "it, then drops") {
    import spark.implicits._
    spark.catalog.clearCache()
    awaitCached(0, "baseline should be cache-free")
    val cached = Seq(1, 2, 3).toDF("x").cache()
    cached.count() // materialize
    assert(cachedRddCount() == 1)
    DeferredUnpersist.afterNextAction(spark, cached)
    // the cache must still serve the very action that consumes it
    assert(cached.agg(sum("x")).head.getLong(0) == 6L)
    awaitCached(0, "cache should drop after the consuming action")
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
}
