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

  test("perceptualHashes: hand-computed tiles on a tiny payload") {
    import spark.implicits._
    // payload of 128 bytes: first half 0x00, second half 0xFF ->
    // tiles 0..31 sum 0 (bit off), tiles 32..63 sum 510 (bit on):
    // b0 = b1 = 0, b2 = b3 = 0xFFFF
    val payload = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(0xFF.toByte)
    val h = Multimodal.perceptualHashes(
      Seq(Multimodal.ImagePayload(1L, payload)).toDS()).head()
    assert((h.b0, h.b1, h.b2, h.b3) == ((0L, 0L, 0xFFFFL, 0xFFFFL)))
    // empty payload -> all-zero bands, no crash
    val e = Multimodal.perceptualHashes(
      Seq(Multimodal.ImagePayload(2L, Array.emptyByteArray)).toDS()).head()
    assert((e.b0, e.b1, e.b2, e.b3) == ((0L, 0L, 0L, 0L)))
  }

  test("perceptual near-dup: banded join equals brute-force Hamming scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      Multimodal.ImagePayload(i.toLong,
        Array.fill[Byte](200 + rnd.nextInt(100))((rnd.nextInt(96) + 32).toByte))
    }
    // noisy twins of every 5th payload: 2 substituted bytes
    val twins = base.filter(_.media_id % 5 == 0).map { p =>
      val b = p.payload.clone()
      b(b.length / 3) = '~'.toByte
      b(2 * b.length / 3) = '~'.toByte
      Multimodal.ImagePayload(p.media_id + 1000L, b)
    }
    val hashes = Multimodal.perceptualHashes((base ++ twins).toDS()).toDF()
    val got = Multimodal.perceptualNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over collected hashes
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      ham = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if ham <= 3
    } yield (ia, ib, ham.toLong)).toSet
    assert(got == brute)
    // the planted twins are found
    val twinPairs = got.collect { case (a, b, _) if b == a + 1000L => a }
    assert(twinPairs.nonEmpty, "no planted twin collided — fixture too noisy")
  }

  test("pixelHashes: a lossless re-encode (PNG vs BMP, same pixels) " +
      "lands at Hamming 0 for the pixel hash and is MISSED by the " +
      "byte-stream hash") {
    import spark.implicits._
    def pixel(id: Long)(x: Int, y: Int): Int = {
      val r = ((id * 7 + 11L * x + 29L * y) % 256).toInt
      val g = ((id * 17 + 5L * x + 3L * y) % 256).toInt
      val b = ((id * 23 + 13L * x + 7L * y) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    val media = (0L until 12L).flatMap { id =>
      val (w, h) = (((id % 13) + 4).toInt, ((id % 7) + 3).toInt)
      Seq(
        Multimodal.ImagePayload(id,
          Multimodal.encodeImage(w, h, "png")(pixel(id))),
        Multimodal.ImagePayload(id + 1000L,
          Multimodal.encodeImage(w, h, "bmp")(pixel(id))))
    }
    // the two byte streams of a pair really are different encodings
    assert(media.grouped(2).forall { case Seq(a, b) =>
      !java.util.Arrays.equals(a.payload, b.payload) })
    val ds = media.toDS()
    // pixel hash: every re-encode pair identical (Hamming 0)
    val px = Multimodal.pixelHashes(ds).collect()
      .map(h => h.media_id -> (h.b0, h.b1, h.b2, h.b3)).toMap
    (0L until 12L).foreach { id =>
      assert(px(id) == px(id + 1000L),
        s"pixel hash must be encoding-invariant (id $id)")
    }
    val pxPairs = Multimodal.perceptualNearDupPairs(
        Multimodal.pixelHashes(ds).toDF(), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 12L).foreach { id =>
      assert(pxPairs.contains((id, id + 1000L)),
        s"pixel near-dup must find the re-encode pair (id $id)")
    }
    // byte-stream hash: the SAME pairs are invisible — the encoded
    // byte streams are unrelated, which is exactly the r12 'weak'
    // this hash closes
    val bytePairs = Multimodal.perceptualNearDupPairs(
        Multimodal.perceptualHashes(ds).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 12L).count(id => bytePairs.contains((id, id + 1000L)))
    assert(found == 0,
      s"byte-stream hash unexpectedly matched $found re-encode pair(s)")
    // determinism across partitionings
    val again = Multimodal.pixelHashes(ds.repartition(5)).collect()
      .map(h => h.media_id -> (h.b0, h.b1, h.b2, h.b3)).toMap
    assert(px == again)
  }

  test("resizeNearest: hand-computed nearest-neighbor sampling") {
    // 4x2 source: columns 0,1 red, columns 2,3 blue (two-tone w/2=2)
    val src = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      src.setRGB(x, y, if (x < 2) 0xFF0000 else 0x0000FF)
    // downscale to 2x1: samples source (0,0) and (2,0) -> red, blue
    val t = Multimodal.resizeNearest(src, 2, 1)
    assert((t.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000)
    assert((t.getRGB(1, 0) & 0xFFFFFF) == 0x0000FF)
    // upscale to 8x2: column x samples source x*4/8 = x/2
    val u = Multimodal.resizeNearest(src, 8, 2)
    for (x <- 0 until 8) {
      val want = if (x / 2 < 2) 0xFF0000 else 0x0000FF
      assert((u.getRGB(x, 1) & 0xFFFFFF) == want, s"col $x")
    }
    // identity resize is pixel-exact
    val id = Multimodal.resizeNearest(src, 4, 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((id.getRGB(x, y) & 0xFFFFFF) == (src.getRGB(x, y) & 0xFFFFFF))
  }

  test("thumbStats: decode -> resize -> sums matches direct pixel math") {
    import spark.implicits._
    val png = Multimodal.encodeTwoTonePng(10, 6, 0x102030, 0x405060)
    val out = Multimodal.thumbStats(
      Seq(Multimodal.ImagePayload(5L, png)).toDS(), 8, 8).head()
    // left tone iff (x*10)//8 < 5: x in 0..3 -> sx 0,1,2,3; x=4 -> 5 (right)
    val nL = (0 until 8).count(x => x * 10 / 8 < 5)
    assert(nL == 4)
    assert(out.width == 8 && out.height == 8)
    assert(out.sum_r == 8L * (nL * 0x10 + (8 - nL) * 0x40))
    assert(out.sum_g == 8L * (nL * 0x20 + (8 - nL) * 0x50))
    assert(out.sum_b == 8L * (nL * 0x30 + (8 - nL) * 0x60))
  }

  test("audio decode: WAV roundtrip is sample-exact; garbage fails loudly") {
    import spark.implicits._
    val samples = Array[Short](0, 100, -100, 32767, -32768, 17)
    val wav = Multimodal.encodePcm16Wav(samples)
    // the container really is a WAV the JDK parser accepts
    val out = Multimodal.audioStats(
      Seq(Multimodal.ImagePayload(3L, wav)).toDS()).head()
    assert(out.n_samples == 6L)
    assert(out.sum_samples == samples.map(_.toLong).sum)
    assert(out.min_sample == -32768L && out.max_sample == 32767L)
    // empty clip: zero stats, no crash
    val empty = Multimodal.audioStats(
      Seq(Multimodal.ImagePayload(4L, Multimodal.encodePcm16Wav(Array.empty[Short]))).toDS()).head()
    assert(empty.n_samples == 0L && empty.sum_samples == 0L)
    // garbage bytes fail loudly, not silently
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.audioStats(
        Seq(Multimodal.ImagePayload(5L, Array.fill[Byte](64)(42))).toDS()).head()
    }
    assert(Option(ex.getCause).nonEmpty)
  }
}
