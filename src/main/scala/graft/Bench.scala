package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // ContextCleaner reaps broadcast/shuffle blocks only after their
      // references are GC'd, and its own fallback GC fires every 30 min
      // — far longer than this whole run. Without a tighter bound, ~90
      // queries of dead blocks pile onto the heap and mid-run queries
      // degrade 10-25x from GC thrash (observed: the same query 128 s
      // mid-run vs 2 s isolated).
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    // ERROR: the bench contract is ONE JSON line on stdout — WARN-level
    // codegen/cache notices must not interleave with it (r1's driver
    // failed to parse the bench output)
    spark.sparkContext.setLogLevel("ERROR")
    // optional args = subset of query names (targeted timing runs);
    // driver invokes with no args -> all queries
    // sorted name order: Map hash order scatters queries differently
    // as the suite grows, so a query's noisy neighbors changed every
    // round — stable order makes per-query numbers comparable across
    // rounds
    val selected =
      (if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.contains).toMap
       else SparkEntry.queries).toSeq.sortBy(_._1)
    // untimed warmup: JVM/session/codegen/parquet-reader init otherwise
    // lands entirely on whichever query happens to run first (map
    // order), which measured 8.6 s for a ~3 s query
    try {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(r.withColumnRenamed("r_name", "x"), "r_regionkey")
        .groupBy("r_regionkey").count().count()
    } catch { case _: Throwable => () }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate queries: intra-query caches are part of a query's own
      // cost, but leaking them across queries pollutes later timings
      // (storage-memory pressure) and lets later twins reuse them
      spark.catalog.clearCache()
      // a streaming query that failed to self-terminate would keep
      // stealing cores from every later timing — stop strays here
      spark.streams.active.foreach(_.stop())
      // OUTSIDE the timed section: let the ContextCleaner actually
      // reclaim this query's dead broadcasts/shuffles now instead of
      // letting 90 queries' worth accumulate into heap thrash
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // context for reading the numbers: this box shows episodic
    // noisy-neighbor contention (identical query sets measured 2-4x
    // apart minutes apart) — load1 says how contended the run was
    val load1 = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","load1":$load1,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
