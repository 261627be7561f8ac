package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as batched partition-local functions
  * (`mapPartitions` over a typed Dataset — the Scala analogue of
  * arrow-batched Python UDFs: per-batch amortized setup, bounded
  * memory, no driver involvement).
  *
  * The actual image/audio codecs are NOT in this container, so the
  * decode step is STUBBED behind [[MediaDecoder]] with a deterministic
  * fake ([[StubDecoder]]); everything Spark-side — schema, typed rows,
  * batch shape, partition parallelism — is real and tested. Swap
  * [[StubDecoder]] for a JNI/JavaCV-backed implementation to go live.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], meta_width: Int, meta_height: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
      byte_len: Long, n_frames_sampled: Int, feature: Array[Float])

  /** Pluggable decoder boundary — the stub point. A real
    * implementation decodes payload bytes (JPEG/PNG/WAV/...) and
    * returns a feature vector. */
  trait MediaDecoder extends Serializable {
    /** Frame/window sampling stride in bytes (stands in for frame
      * sampling of video / windowing of audio). */
    def stride: Int
    def decode(kind: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decode: samples every `stride`-th byte (the
    * "frame sample") and emits 8 coarse byte-histogram bins as the
    * "feature". Pure function of the payload — stable across runs,
    * partitionings, and engines. */
  final class StubDecoder(val stride: Int = 16) extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xFF) >> 5) += 1f
        i += stride
      }
      bins
    }
  }

  /** REAL image decode leg — pure-JDK `javax.imageio.ImageIO`
    * (PNG/JPEG/GIF/BMP ship with the JRE, no native libs), decoding
    * actual compressed bytes to pixels. Feature vector:
    * `[width, height, meanR, meanG, meanB]`. Throws with a clear
    * message on undecodable payloads — silent nulls would let corrupt
    * media rot a training set unnoticed. */
  final class ImageIoDecoder extends MediaDecoder {
    val stride: Int = 1
    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val s = decodeStats(payload)
      val n = s.width.toLong * s.height
      Array(s.width.toFloat, s.height.toFloat,
        (s.sum_r.toDouble / n).toFloat,
        (s.sum_g.toDouble / n).toFloat,
        (s.sum_b.toDouble / n).toFloat)
    }
  }

  final case class ImagePayload(media_id: Long, payload: Array[Byte])

  /** Exact per-image channel stats — integer sums, not float means, so
    * downstream checks (and the DuckDB gate) stay hash-exact. */
  final case class ImageStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private def decodeStats(payload: Array[Byte]): ImageStats = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"undecodable image payload (${payload.length} bytes): no " +
        "registered ImageIO reader recognized the format")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    ImageStats(0L, w, h, sr, sg, sb)
  }

  /** Distributed image decode: partition-local ImageIO over binary
    * payloads, one compressed image in flight per record (pixels never
    * leave the executor — only the dimension+sum summary shuffles).
    * The scale shape for 100 TB of media: payload columns stay opaque
    * bytes end-to-end; decode is embarrassingly parallel; output is a
    * few fixed-width columns per image. */
  def imageStats(media: Dataset[ImagePayload]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      decodeStats(r.payload).copy(media_id = r.media_id)))
  }

  /** PNG-encode a two-tone RGB image entirely in the JVM (ImageIO
    * writer): columns `x < w/2` get `rgbLeft`, the rest `rgbRight`.
    * Deterministic closed-form pixel content = the fixture generator
    * for the decode gate (PNG is lossless, so decoded sums are exactly
    * the arithmetic the oracle restates in SQL). */
  def encodeTwoTonePng(w: Int, h: Int, rgbLeft: Int, rgbRight: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) rgbLeft else rgbRight)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out),
      "no PNG ImageIO writer registered")
    out.toByteArray
  }

  /** Demo media table: document text re-encoded as UTF-8 binary
    * payloads (stands in for image/audio bytes at fixture scale). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("meta_width"),
      (col("n_chars") % 480).cast("int").as("meta_height"))

  /** REAL image RESIZE leg — explicit nearest-neighbor sampling
    * (target pixel (x,y) reads source pixel `(x*w div tw, y*h div th)`),
    * not `Graphics2D` scaling, whose interpolation is implementation-
    * defined and would break bit-reproducibility across JVMs. Resize
    * is the standard pre-normalization before feature extraction /
    * perceptual hashing (aHash's 8x8 downscale IS a nearest/mean
    * resize). Runs inside the same partition-local decode pass:
    * compressed bytes in, a thumbnail-sized stat row out, full-res
    * pixels never shuffle. */
  def resizeNearest(img: java.awt.image.BufferedImage, tw: Int,
      th: Int): java.awt.image.BufferedImage = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < th) {
      val sy = ((y.toLong * h) / th).toInt
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, img.getRGB(((x.toLong * w) / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode -> nearest-neighbor resize to (tw x th) -> exact integer
    * channel sums of the THUMBNAIL. The distributed normalize-then-
    * summarize shape: per image, only the fixed-width thumbnail
    * summary leaves the executor. */
  def thumbStats(media: Dataset[ImagePayload], tw: Int,
      th: Int): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null,
        s"undecodable image payload (${r.payload.length} bytes)")
      val t = resizeNearest(img, tw, th)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          val rgb = t.getRGB(x, y)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      ImageStats(r.media_id, tw, th, sr, sg, sb)
    })
  }

  /** Encode 16-bit signed little-endian mono PCM samples as a WAV
    * container — a handcrafted RIFF header (44 bytes) + the sample
    * bytes, so the fixture bytes are a closed-form function of the
    * samples with no encoder library in the loop. */
  def encodePcm16Wav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)          // PCM
      .putShort(1.toShort)          // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)       // byte rate
      .putShort(2.toShort)          // block align
      .putShort(16.toShort)         // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Exact per-clip audio stats from DECODED samples. */
  final case class AudioStats(media_id: Long, n_samples: Long,
      sum_samples: Long, min_sample: Long, max_sample: Long)

  /** REAL audio decode leg — pure-JDK `javax.sound.sampled`
    * (WAV/PCM ships with the JRE): compressed container bytes in,
    * exact integer sample stats out, the audio analogue of
    * [[imageStats]]. Samples are reconstructed 16-bit signed LE from
    * the decoded frame stream; integer sums, so the DuckDB gate can
    * restate a closed-form fixture arithmetically. Fails loudly on
    * undecodable payloads or non-16-bit formats. */
  def audioStats(media: Dataset[ImagePayload]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian,
        s"expected 16-bit LE mono PCM, got $fmt")
      val bytes = in.readAllBytes()
      in.close()
      var (n, sum) = (0L, 0L)
      var (mn, mx) = (Long.MaxValue, Long.MinValue)
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toLong
        n += 1; sum += s
        if (s < mn) mn = s
        if (s > mx) mx = s
        i += 2
      }
      AudioStats(r.media_id, n, sum, if (n == 0) 0L else mn,
        if (n == 0) 0L else mx)
    })
  }

  /** Encode an arbitrary RGB pixel function as compressed image bytes
    * via the JDK's ImageIO writers (`"png"`, `"bmp"` — both lossless
    * 24-bit, so decode returns exactly `pixel(x, y)`; the fixture
    * primitive for SAME-PIXELS-TWO-ENCODINGS near-dup pairs, the
    * canonical multimodal duplicate class a byte-stream hash cannot
    * match). */
  def encodeImage(w: Int, h: Int, format: String)(
      pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no $format ImageIO writer registered")
    out.toByteArray
  }

  final case class PerceptualHash(media_id: Long, b0: Long, b1: Long,
      b2: Long, b3: Long)

  /** PIXEL-SPACE average-hash (true aHash): decode the compressed
    * payload, nearest-neighbor-downscale to 8x8 ([[resizeNearest]]'s
    * exact integer sampling), luma per cell as the integer channel
    * sum `r+g+b` (0..765 — no float weights, so both engines compute
    * identical bits), bit_i = `64*luma_i > total` (the integer
    * mean-threshold compare), tile index `y*8+x`, packed as FOUR
    * 16-bit bands for the same pigeonhole serve as
    * [[perceptualHashes]].
    *
    * This is the hash that matches a RE-ENCODE of the same image —
    * PNG vs BMP, or any lossless transcode, produces an unrelated
    * byte stream but identical pixels, so identical bands (Hamming
    * 0); the byte-stream [[perceptualHashes]] provably misses that
    * pair (spec-pinned). Scale shape unchanged: decode + hash are
    * partition-local, only the 4-long fingerprint row shuffles into
    * the banded candidate join. */
  def pixelHashes(media: Dataset[ImagePayload]): Dataset[PerceptualHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null,
        s"undecodable image payload (${r.payload.length} bytes): no " +
          "registered ImageIO reader recognized the format")
      val t = resizeNearest(img, 8, 8)
      val lum = new Array[Long](64)
      var tot = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val rgb = t.getRGB(x, y)
          val l = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
            (rgb & 0xFF)).toLong
          lum(y * 8 + x) = l
          tot += l
          x += 1
        }
        y += 1
      }
      val bands = new Array[Long](4)
      var i = 0
      while (i < 64) {
        if (lum(i) * 64 > tot) bands(i / 16) |= 1L << (i % 16)
        i += 1
      }
      PerceptualHash(r.media_id, bands(0), bands(1), bands(2), bands(3))
    })
  }

  /** PERCEPTUAL average-hash (aHash) over a media payload — the
    * standard first-pass image near-dup signature (downscale to 8x8,
    * threshold each cell against the mean, 64-bit fingerprint;
    * Hamming distance = perceptual difference). Here the downscale is
    * 64 equal tiles over the byte stream (`tile(j) = 64*j div n`, the
    * 1-D analogue — feed decoded grayscale rows for real images),
    * tile energy = exact byte sums, bit_i = `64*sum_i > total`
    * (integer compare, no float mean), packed as FOUR 16-bit bands so
    * candidate generation can pigeonhole: two hashes within Hamming
    * distance 3 must agree on at least one band.
    *
    * All integer arithmetic — engine-portable, so the DuckDB gate
    * recomputes every bit. Empty payloads hash to all-zero bands. */
  def perceptualHashes(media: Dataset[ImagePayload]): Dataset[PerceptualHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.payload
      val n = b.length
      val sums = new Array[Long](64)
      var j = 0
      while (j < n) { sums((64L * j / n).toInt) += (b(j) & 0xFF).toLong; j += 1 }
      var tot = 0L
      var i = 0
      while (i < 64) { tot += sums(i); i += 1 }
      val bands = new Array[Long](4)
      i = 0
      while (i < 64) {
        if (sums(i) * 64 > tot) bands(i / 16) |= 1L << (i % 16)
        i += 1
      }
      PerceptualHash(r.media_id, bands(0), bands(1), bands(2), bands(3))
    })
  }

  /** Near-dup media pairs by banded pigeonhole over [[perceptualHashes]]
    * + exact Hamming verification. EXHAUSTIVE for `maxHamming <= 3`:
    * with 4 bands, 3 differing bits cannot touch all four, so every
    * qualifying pair shares at least one band bucket — the same
    * guarantee shape as MinHash banding, but deterministic. Scale:
    * one equi-join shuffled on (band index, band value); no all-pairs
    * scan; verification is a codegen'd xor/bit_count projection on
    * candidate rows only. */
  def perceptualNearDupPairs(hashes: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole is only exhaustive for maxHamming <= 3")
    val bands = hashes.select(col("media_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("bj", "bv")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bj") === col("b.bj") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val ham = (0 to 3).map(i =>
        bit_count(col(s"ha.b$i").bitwiseXOR(col(s"hb.b$i"))).cast("bigint"))
      .reduce(_ + _)
    cand
      .join(hashes.as("ha"), col("id_a") === col("ha.media_id"))
      .join(hashes.as("hb"), col("id_b") === col("hb.media_id"))
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Batched feature extraction: partition-local, `batchSize` records
    * per decode call (mirrors arrow-batch decode APIs); executors never
    * materialize more than one batch of payloads at once beyond the
    * scan itself. */
  def extractFeatures(media: Dataset[MediaRecord], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val feat = decoder.decode(r.kind, r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
            (r.payload.length + decoder.stride - 1) / decoder.stride, feat)
        }
      }
    }
  }
}
