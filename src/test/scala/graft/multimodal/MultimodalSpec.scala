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

  test("ImageIO decode: PNG roundtrip is pixel-exact, hand-computed sums") {
    import spark.implicits._
    // 5x3 two-tone: left 2 columns (10,20,30), right 3 columns (200,100,50)
    val png = Multimodal.encodeTwoTonePng(5, 3,
      (10 << 16) | (20 << 8) | 30, (200 << 16) | (100 << 8) | 50)
    val stats = Multimodal.imageStats(
      Seq(Multimodal.ImagePayload(7L, png)).toDS()).collect().head
    assert(stats == Multimodal.ImageStats(7L, 5, 3,
      sum_r = 3 * (2 * 10 + 3 * 200),
      sum_g = 3 * (2 * 20 + 3 * 100),
      sum_b = 3 * (2 * 30 + 3 * 50)))
    // the MediaDecoder-trait view agrees: [w, h, meanR, meanG, meanB]
    val feat = new Multimodal.ImageIoDecoder().decode("image", png)
    assert(feat(0) == 5f && feat(1) == 3f)
    assert(math.abs(feat(2) - (3.0 * (2 * 10 + 3 * 200) / 15)) < 1e-4)
  }

  test("ImageIO decode: JPEG dims exact, lossy channel means within tolerance") {
    // a JPEG leg proves the decoder isn't PNG-special-cased: encode a
    // flat gray image (JPEG compresses flat fields near-losslessly)
    val img = new java.awt.image.BufferedImage(
      16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img.setRGB(x, y, (128 << 16) | (128 << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val feat = new Multimodal.ImageIoDecoder().decode("image", out.toByteArray)
    assert(feat(0) == 16f && feat(1) == 8f)
    Seq(feat(2), feat(3), feat(4)).foreach(m =>
      assert(math.abs(m - 128f) < 2f, s"channel mean $m drifted"))
  }

  test("ImageIO decode: undecodable payload fails loudly, not silently") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.imageStats(
        Seq(Multimodal.ImagePayload(1L, garbage)).toDS()).collect()
    }
    assert(ex.getMessage.contains("undecodable") ||
      Option(ex.getCause).exists(_.getMessage.contains("undecodable")))
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
