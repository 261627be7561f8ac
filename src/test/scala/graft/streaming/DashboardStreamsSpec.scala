package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.stats.DashboardStats

case class StreamFactRow(
    monthyr: String, provider: String, specialty: String, pathway: String,
    is_provider: Int, weeks: Seq[Long], unknown_start: Long,
    total_all: Long, commissioner_code: String)

/** The monthly-append idiom as a real stream: drop month files into a
  * folder, run AvailableNow triggers, and after EACH trigger the
  * incrementally-maintained step-1 base must equal the batch cube's
  * base over all data seen so far — and statsFromBase on that state
  * must equal the full batch compute. */
class DashboardStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val B = 6

  private def bands(entries: (Int, Long)*): Seq[Long] = {
    val a = Array.fill(B)(0L)
    entries.foreach { case (b, c) => a(b - 1) = c }
    a.toSeq
  }

  private val month1 = Seq(
    StreamFactRow("Apr21", "P1", "Total", "incomplete", 0,
      bands(1 -> 10L, 2 -> 30L), 0L, 0L, "C1"),
    StreamFactRow("Apr21", "P2", "Total", "incomplete", 1,
      bands(2 -> 25L), 0L, 0L, "C1"),
    StreamFactRow("Apr21", "P1", "Total", "incomplete", 0,
      bands(1 -> 999L), 0L, 0L, "NONC")) // excluded

  private val month2 = Seq(
    StreamFactRow("May21", "P1", "Total", "incomplete", 0,
      bands(3 -> 40L), 0L, 0L, "C1"),
    // same key as an Apr21 cell: state must merge, not duplicate
    StreamFactRow("Apr21", "P1", "Total", "incomplete", 0,
      bands(2 -> 5L), 0L, 0L, "C1"))

  private def canon(df: DataFrame): Set[(String, String, String, String, Int, Seq[Long], Long, Long)] =
    df.collect().map { r =>
      (r.getAs[String]("monthyr"), r.getAs[String]("grp"),
        r.getAs[String]("specialty"), r.getAs[String]("pathway"),
        r.getAs[Int]("is_provider"), r.getAs[Seq[Long]]("weeks"),
        r.getAs[Long]("unknown_start"), r.getAs[Long]("total_all"))
    }.toSet

  private def batchBase(rows: Seq[StreamFactRow]): DataFrame = {
    import spark.implicits._
    rows.toDF().filter(col("commissioner_code") =!= "NONC")
      .groupBy(col("monthyr"), col("provider").as("grp"),
        col("specialty"), col("pathway"), col("is_provider"))
      .agg(graft.ops.HistogramOps.sumBands(col("weeks"), B).as("weeks"),
        coalesce(sum("unknown_start"), lit(0L)).as("unknown_start"),
        coalesce(sum("total_all"), lit(0L)).as("total_all"))
  }

  test("incremental base tracks the batch base across monthly drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cube-stream")
    spark.catalog.dropTempView("cube_base_stream")

    // file source lists top-level files; write each month as one file
    def stage(rows: Seq[StreamFactRow], name: String): Unit = {
      val tmp = dir.resolve(name + ".tmpdir").toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
    }

    stage(month1, "apr21.parquet")
    val stream = DashboardStreams.readFacts(spark, dir.toString)
    val q1 = DashboardStreams.incrementalBase(stream, "provider", B)
      .writeStream.format("memory").queryName("cube_base_stream")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    assert(canon(spark.table("cube_base_stream")) == canon(batchBase(month1)))

    // month 2 arrives: SAME checkpoint resumes state; only new file read
    stage(month2, "may21.parquet")
    val q2 = DashboardStreams.incrementalBase(
        DashboardStreams.readFacts(spark, dir.toString), "provider", B)
      .writeStream.format("memory").queryName("cube_base_stream")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000); q2.stop()
    val all = month1 ++ month2
    assert(canon(spark.table("cube_base_stream")) == canon(batchBase(all)))

    // the small streamed state feeds the same downstream stats as the
    // full batch compute
    val fromStream = DashboardStats.statsFromBase(
      spark.table("cube_base_stream"),
      DashboardStats.Config(maxBands = B))
    val fromBatch = DashboardStats.compute(
      all.toDF(), "provider", DashboardStats.Config(maxBands = B))
    val key = Seq("monthyr", "grp", "is_slice", "pathway")
    val a = fromStream.orderBy(key.map(col): _*).collect().toSeq
    val b = fromBatch.orderBy(key.map(col): _*).collect().toSeq
    assert(a == b)
  }
}
