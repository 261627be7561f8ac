package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query job-storm profiler: runs named SparkEntry queries with a
  * listener that attributes every scheduled job — including the
  * broadcast-exchange futures hidden behind the thread pool's anon
  * frame — to the SQL execution (action call site) that spawned it.
  * `sbt "runMain graft.tools.QueryJobProbe [sfDir] <q...>"`. Dev
  * diagnosis only; not part of the driver contract. */
object QueryJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass query names")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
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
        val names0 = j.stageInfos.map(_.name.takeWhile(_ != '+').trim)
        val site = names0.find(!_.contains("CompletableFuture"))
          .orElse(names0.lastOption).getOrElse("?")
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
          bySite.merge(site, (1, j.time - t0),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })

    // warmup (same as Bench)
    try {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(r.withColumnRenamed("r_name", "x"), "r_regionkey")
        .groupBy("r_regionkey").count().count()
    } catch { case _: Throwable => () }

    names.foreach { name =>
      jobs = 0; bySite.clear(); execSite.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"query":"$name","sec":$sec%.2f,"jobs":$jobs}""")
      import scala.jdk.CollectionConverters._
      bySite.asScala.toSeq.sortBy(-_._2._2).take(16).foreach {
        case (site, (n2, ms)) =>
          println(f"  [site] $site%-64s n=$n2%-4d ${ms / 1000.0}%7.2f s")
      }
      spark.catalog.clearCache()
      spark.streams.active.foreach(_.stop())
      System.gc()
    }
    spark.stop()
  }
}
