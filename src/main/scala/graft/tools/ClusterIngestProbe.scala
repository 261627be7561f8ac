package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-drop fixed-overhead profiler for the cluster-table ingest:
  * `sbt "runMain graft.tools.ClusterIngestProbe [sfDir] [drops]"`.
  *
  * Inits the table on the standing corpus (doc_id % 3 <> 0), then
  * ingests the rest as `drops` equal ordered slices, counting the
  * SPARK JOBS and wall-clock each ingest schedules — the per-trigger
  * cost every micro-batch of `clusterIngestStream` pays. Prints one
  * JSON line per drop plus a summary. */
object ClusterIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDrops = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PROBE_PFIRST", "true"))
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("PROBE_PREFER_SMJ", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    // executionId -> callsite of the action that opened the execution
    val execSite = new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            // nextOption: an empty description would throw inside the
            // listener (bus error noise + unattributed broadcast jobs)
            execSite.put(s.executionId.toString,
              s.description.linesIterator.nextOption().getOrElse("?").take(60))
          case _ => ()
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(_.name.takeWhile(_ != '+').trim)
        val site = names.find(!_.contains("CompletableFuture"))
          .orElse(names.lastOption).getOrElse("?")
        // broadcast-future jobs hide their origin behind the thread
        // pool's anon frame — attribute them to the SQL execution that
        // spawned them (the job description carries the action) so the
        // per-drop job storm is explainable action by action
        val tagged = if (!site.contains("CompletableFuture")) site else {
          val eid = Option(
            j.properties.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(j.properties.getProperty("spark.sql.execution.id")))
            .getOrElse("?")
          "bcast: exec " + eid + " " +
            Option(execSite.get(eid)).getOrElse("?")
        }
        starts.put(j.jobId, (j.time, tagged))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val ms = j.time - t0
          jobMs += ms
          bySiteMerge(site, ms)
        }
      }
      private def bySiteMerge(site: String, ms: Long): Unit =
        bySite.merge(site, (1, ms),
          (a, b) => (a._1 + b._1, a._2 + b._2))
    })

    val docs = spark.read.parquet(sfDir + "/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()
    val standing = docs.where(col("doc_id") % 3 =!= 0)
    val dropAll = docs.where(col("doc_id") % 3 === 0)
      .withColumn("__slice", pmod(col("doc_id") / 3, lit(nDrops.toLong)).cast("long"))
      .cache()
    dropAll.count()
    val dir = graft.util.TempDirs.scoped("cluster-ingest-probe")
      .toString + "/store"
    graft.dedup.Dedup.clusterTableInit(standing, "doc_id", "text", dir)

    var totSec = 0.0; var totJobs = 0
    (0 until nDrops).foreach { k =>
      val drop = dropAll.where(col("__slice") === k).drop("__slice")
      val nd = drop.count()
      jobs = 0; jobMs = 0L; bySite.clear()
      val t0 = System.nanoTime()
      graft.dedup.Dedup.clusterTableIngest(drop, docs, "doc_id", "text",
        dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      totSec += sec; totJobs += jobs
      println(f"""{"drop":$k,"rows":$nd,"sec":$sec%.2f,"jobs":$jobs,"job_ms":$jobMs}""")
      import scala.jdk.CollectionConverters._
      bySite.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
        case (site, (n2, ms)) =>
          println(f"  [site] $site%-50s n=$n2%-4d ${ms / 1000.0}%7.2f s")
      }
    }
    println(f"""{"summary":true,"drops":$nDrops,"total_sec":$totSec%.2f,"mean_sec":${totSec / nDrops}%.2f,"mean_jobs":${totJobs.toDouble / nDrops}%.1f}""")
    // the idle-trigger cost: an EMPTY drop (what a streaming
    // micro-batch pays when no files arrived)
    jobs = 0; jobMs = 0L; bySite.clear()
    val t0e = System.nanoTime()
    graft.dedup.Dedup.clusterTableIngest(
      dropAll.where(col("doc_id") < 0).drop("__slice"),
      docs, "doc_id", "text", dir).count()
    println(f"""{"empty_drop":true,"sec":${(System.nanoTime() - t0e) / 1e9}%.2f,"jobs":$jobs}""")
    spark.stop()
  }
}
