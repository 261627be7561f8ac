package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stub decode: deterministic features, correct frame counts") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf))
      .as[Multimodal.MediaRecord]
    val decoder = new Multimodal.StubDecoder(16)
    val feats = Multimodal.extractFeatures(media, decoder).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature.length == 8)
      assert(f.n_frames_sampled == (f.byte_len + 15) / 16)
      // histogram mass == sampled frames
      assert(f.feature.map(_.toLong).sum == f.n_frames_sampled)
    }
    // determinism across runs and partitionings
    val again = Multimodal.extractFeatures(
      media.repartition(7), decoder).collect()
    assert(feats.map(f => f.media_id -> f.feature.toSeq).toMap ==
      again.map(f => f.media_id -> f.feature.toSeq).toMap)
  }

  test("decode is batched (batchSize respected end-to-end)") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf))
      .as[Multimodal.MediaRecord]
    // tiny batch size must produce identical results (shape-only knob)
    val a = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16), 3)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16), 256)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(a == b)
  }
}
