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

  test("streamed LSH index emits cross-drop candidates from resumed state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-stream")
    val sink = dir.resolve("out").toString
    val drops = java.nio.file.Files.createDirectory(dir.resolve("drops"))

    def stage(rows: Seq[DropDoc], name: String): Unit = {
      val tmp = dir.resolve(name + ".tmpdir").toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, drops.resolve(name))
    }
    def run(): Unit = {
      val q = PipelineStreams.lshCandidates(
          PipelineStreams.readDocs(spark, drops.toString)).toDF()
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000)); q.stop()
    }
    def pairs(): Set[(Long, Long)] =
      spark.read.schema("id_a BIGINT, id_b BIGINT").parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val a = "the quick brown fox jumps over the lazy dog again and again"
    stage(Seq(
      DropDoc(1L, a, "en", "s", a.length.toLong),
      DropDoc(2L, "completely unrelated words about other topics entirely here",
        "en", "s", 60L)), "d1.parquet")
    run()
    assert(pairs().isEmpty, "no near-dups within drop 1")

    // drop 2: doc 10 repeats doc 1's text -> identical signature, every
    // band collides; the pair must surface from CHECKPOINT-RESUMED
    // bucket state, not any same-batch comparison
    stage(Seq(DropDoc(10L, a, "en", "s", a.length.toLong)), "d2.parquet")
    run()
    assert(pairs() == Set((1L, 10L)),
      s"cross-drop collision must be found once per colliding band set, got ${pairs()}")
  }

  test("streamed LSH candidates == batch minhash pairs after exact verification") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = PipelineStreams.stageOrderedDrops(docs, "doc_id", 4, "graft-lsh-corpus")
    spark.catalog.dropTempView("lsh_cand_test")
    val q = PipelineStreams.lshCandidates(
        spark.readStream.schema(PipelineStreams.docSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir.toString)).toDF()
      .writeStream.format("memory").queryName("lsh_cand_test")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000)); q.stop()
    val streamed = graft.dedup.Dedup.verifyCandidatePairs(
        spark.table("lsh_cand_test"), docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.dedup.Dedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missing ${batch -- streamed}, spurious ${streamed -- batch}")
  }
}
