package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

case class DropDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

/** Streaming exact dedup: state must persist across drops (via the
  * checkpoint), first sighting wins, and within a batch the minimum
  * doc id claims the fingerprint. */
class PipelineStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("first-seen dedup holds state across drops; min id wins in-batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-stream")
    val sink = dir.resolve("out").toString
    val drops = java.nio.file.Files.createDirectory(dir.resolve("drops"))

    // memory sink cannot RECOVER a checkpoint (append mode), and this
    // test's whole point is resuming state on drop 2 — so the keeper
    // stream appends to a durable parquet sink like production would
    def keepers(): Map[String, Long] =
      spark.read.schema("fingerprint STRING, keeper BIGINT").parquet(sink)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    def stage(rows: Seq[DropDoc], name: String): Unit = {
      val tmp = dir.resolve(name + ".tmpdir").toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, drops.resolve(name))
    }
    def run(): Unit = {
      val q = PipelineStreams.firstSeenDedup(
          PipelineStreams.readDocs(spark, drops.toString)).toDF()
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000)); q.stop()
    }

    // drop 1: "a b" under ids 2 and 1 (same fingerprint, min id 1 must
    // win within the batch); "c d" unique; whitespace/case variants of
    // "a b" normalize to the same fingerprint
    stage(Seq(
      DropDoc(2L, "a b", "en", "s", 3L),
      DropDoc(1L, "A  b ", "en", "s", 5L),
      DropDoc(3L, "c d", "en", "s", 3L)), "d1.parquet")
    run()
    val k1 = keepers()
    assert(k1.size == 2)
    val fpAB = k1.find(_._2 == 1L).map(_._1)
    assert(fpAB.isDefined, s"'a b' fingerprint must keep id 1, got $k1")

    // drop 2: id 10 repeats "a b" (must NOT re-emit — state filters
    // it), id 11 brings a new fingerprint (must emit)
    stage(Seq(
      DropDoc(10L, "a b", "en", "s", 3L),
      DropDoc(11L, "e f", "en", "s", 3L)), "d2.parquet")
    run()
    val k2 = keepers()
    assert(k2.size == 3, s"exactly one new keeper, got $k2")
    assert(k2(fpAB.get) == 1L, "drop-2 repeat must not steal the fingerprint")
    assert(k2.values.toSet == Set(1L, 3L, 11L))
  }
}
