package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payloads + typed metadata, with
  * the batched stub decoder (see [[graft.multimodal.Multimodal]]).
  * Metadata/hash ops are oracle-checked; the decode/feature path is
  * deterministic but not SQL-portable (rows-only check + spec).
  */
object MultimodalQueries {
  private type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Binary metadata: byte lengths + content hash over the payload.
    "q_mm_meta" -> ((s, d) => {
      Multimodal.fromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          length(col("payload")).cast("bigint").as("byte_len"),
          sha2(col("payload"), 256).as("payload_sha256"),
          col("meta_width").cast("bigint").as("meta_width"),
          col("meta_height").cast("bigint").as("meta_height"))
        .orderBy("media_id")
    }),

    // Batched stub decode -> per-kind feature aggregation. Oracled:
    // every sampled byte lands in exactly ONE histogram bin, so the
    // decoder's total feature mass must equal the frame count, and
    // frames = ceil(byte_len/stride) — a formula DuckDB computes
    // independently of the decode path. An off-by-one in the sampling
    // loop, a dropped batch, or a lost partition all break the match.
    // Bin PLACEMENT (byte>>5) is not SQL-portable and stays covered by
    // MultimodalSpec's hand-computed vectors.
    "q_mm_features" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .as[Multimodal.MediaRecord]
      val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16))
      feats.toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum("byte_len").as("total_bytes"),
          sum("n_frames_sampled").cast("bigint").as("total_frames"),
          // bin counts are integers; the double fold is exact < 2^53
          sum(expr("aggregate(feature, cast(0.0 as double), (a, x) -> a + double(x))"))
            .cast("bigint").as("total_feature_mass"))
        .orderBy("kind")
    }),

    // REAL image decode gate: per-doc two-tone PNGs are encoded by the
    // JVM's ImageIO writer from a closed-form color/size recipe, then
    // DECODED BACK by graft's ImageIoDecoder leg — actual compressed
    // PNG bytes through the actual codec, distributed via the same
    // typed mapPartitions plumbing as the stub path. The output columns
    // are the DECODED integer pixel sums; the oracle recomputes them
    // from the recipe arithmetically (PNG is lossless), so a decoder
    // that misreads dimensions, channel order, or any pixel breaks the
    // hash. Scale shape: pixels never leave the executor — only the
    // fixed-width summary row per image shuffles.
    "q_mm_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          ((col("doc_id") % 13) + 4).cast("int").as("w"),
          ((col("doc_id") % 7) + 3).cast("int").as("h"),
          (col("doc_id") * 37 % 256).cast("int").as("ra"),
          (col("doc_id") * 59 % 256).cast("int").as("ga"),
          (col("doc_id") * 83 % 256).cast("int").as("ba"),
          ((col("doc_id") * 101 + 7) % 256).cast("int").as("rb"),
          ((col("doc_id") * 131 + 11) % 256).cast("int").as("gb"),
          ((col("doc_id") * 151 + 13) % 256).cast("int").as("bb"))
        .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
        .map { case (id, w, h, ra, ga, ba, rb, gb, bb) =>
          Multimodal.ImagePayload(id, Multimodal.encodeTwoTonePng(
            w, h, (ra << 16) | (ga << 8) | ba, (rb << 16) | (gb << 8) | bb))
        }
      Multimodal.imageStats(media).toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    }),

    // REAL audio decode gate: closed-form 16-bit PCM clips are wrapped
    // in a handcrafted WAV container (no encoder library — the bytes
    // are a pure function of the sample formula), then decoded back
    // through the actual javax.sound WAV parser; the emitted integer
    // sample stats must match the formula restated in SQL. A parser
    // that misreads the header, drops frames, or flips endianness
    // breaks the hash.
    "q_mm_audio" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          (lit(200) + col("doc_id") % 100).cast("int").as("n"))
        .as[(Long, Int)]
        .map { case (id, n) =>
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort)
          Multimodal.ImagePayload(id, Multimodal.encodePcm16Wav(samples))
        }
      Multimodal.audioStats(media).toDF().orderBy("media_id")
    }),

    // REAL resize gate: the q_mm_decode two-tone PNGs decoded and
    // nearest-neighbor-downscaled to 8x8 by the engine; the oracle
    // recomputes the thumbnail arithmetically (target column x samples
    // source column x*w div 8 — left tone iff that lands under w div 2;
    // rows are color-uniform, so sums = 8 * per-row sums). A resize
    // that misindexes by one pixel or swaps channel order breaks the
    // hash.
    "q_mm_resize" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          ((col("doc_id") % 13) + 4).cast("int").as("w"),
          ((col("doc_id") % 7) + 3).cast("int").as("h"),
          (col("doc_id") * 37 % 256).cast("int").as("ra"),
          (col("doc_id") * 59 % 256).cast("int").as("ga"),
          (col("doc_id") * 83 % 256).cast("int").as("ba"),
          ((col("doc_id") * 101 + 7) % 256).cast("int").as("rb"),
          ((col("doc_id") * 131 + 11) % 256).cast("int").as("gb"),
          ((col("doc_id") * 151 + 13) % 256).cast("int").as("bb"))
        .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)]
        .map { case (id, w, h, ra, ga, ba, rb, gb, bb) =>
          Multimodal.ImagePayload(id, Multimodal.encodeTwoTonePng(
            w, h, (ra << 16) | (ga << 8) | ba, (rb << 16) | (gb << 8) | bb))
        }
      Multimodal.thumbStats(media, 8, 8).toDF()
        .select(col("media_id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    }),

    // Perceptual near-dup (aHash + banded pigeonhole): planted
    // "re-encodes" of every % 10 = 7 payload (3 bytes substituted at
    // spread positions — the pixel-noise analogue; an APPEND would
    // shift all 64 tile boundaries and is exactly the transform a
    // perceptual hash should NOT match) must collide with their
    // original within Hamming 2, while word-salad background pairs
    // sit at median distance ~31. The 4-band pigeonhole is exhaustive
    // for Hamming <= 3, so DuckDB's all-pairs scan is the exact
    // oracle for the banded join's output.
    "q_mm_neardup" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text"))
      val twins = Tables.documents(s, d).where(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 3000000L).as("media_id"),
          expr("""concat(
            substring(text, 1, length(text) div 4), '~',
            substring(text, length(text) div 4 + 2,
              length(text) div 2 - length(text) div 4 - 1), '~',
            substring(text, length(text) div 2 + 2,
              3 * length(text) div 4 - length(text) div 2 - 1), '~',
            substring(text, 3 * length(text) div 4 + 2))""").as("text"))
      val media = base.unionByName(twins)
        .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[Multimodal.ImagePayload]
      val hashes = Multimodal.perceptualHashes(media).toDF()
      Multimodal.perceptualNearDupPairs(hashes, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }),

    // PIXEL-SPACE perceptual near-dup (true aHash): planted pairs are
    // the SAME PIXELS encoded twice — PNG for the base corpus, BMP for
    // every % 10 = 7 twin (both lossless, so decode returns exactly
    // the closed-form pixel recipe). The byte streams of a pair are
    // unrelated (different codecs), so the byte-tile hash provably
    // misses them (spec-pinned in MultimodalSpec) while this hash —
    // decode, 8x8 nearest downscale, integer-luma mean threshold —
    // lands every pair at Hamming 0. The oracle recomputes all 64
    // bits per image from the recipe arithmetic and restates the
    // banded join as the exhaustive all-pairs scan (exact by the
    // 4-band pigeonhole guarantee for Hamming <= 3).
    "q_mm_phash_neardup" -> ((s, d) => {
      import s.implicits._
      def payload(mediaId: Long, id: Long, fmt: String) =
        Multimodal.ImagePayload(mediaId, Multimodal.encodeImage(
          ((id % 13) + 4).toInt, ((id % 7) + 3).toInt, fmt) { (x, y) =>
          val r = ((id * 7 + 11L * x + 29L * y) % 256).toInt
          val g = ((id * 17 + 5L * x + 3L * y) % 256).toInt
          val b = ((id * 23 + 13L * x + 7L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
      val base = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map(id => payload(id, id, "png"))
      val twins = Tables.documents(s, d).where(col("doc_id") % 10 === 7)
        .select(col("doc_id")).as[Long]
        .map(id => payload(id + 3000000L, id, "bmp"))
      val hashes = Multimodal.pixelHashes(base.union(twins)).toDF()
      Multimodal.perceptualNearDupPairs(hashes, maxHamming = 2)
        .orderBy("id_a", "id_b")
    }))

  val oracles: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS payload_sha256,
        |  n_chars % 640 AS meta_width,
        |  n_chars % 480 AS meta_height
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_mm_features" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS byte_len,
        |    CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS frames
        |  FROM documents)
        |SELECT kind, count(*) AS n_media,
        |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |  CAST(sum(frames) AS BIGINT) AS total_frames,
        |  CAST(sum(frames) AS BIGINT) AS total_feature_mass
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,
    // the decode gate's oracle: pure arithmetic over the same two-tone
    // recipe — h * (leftCols*colorA + rightCols*colorB) per channel,
    // leftCols = w/2 (integer division; columns x < w/2 are the left
    // tone). The engine-side numbers come from REAL PNG decode.
    "q_mm_decode" ->
      """WITH r AS (
        |  SELECT doc_id AS media_id,
        |    (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h,
        |    (doc_id * 37) % 256 AS ra, (doc_id * 59) % 256 AS ga,
        |    (doc_id * 83) % 256 AS ba,
        |    (doc_id * 101 + 7) % 256 AS rb, (doc_id * 131 + 11) % 256 AS gb,
        |    (doc_id * 151 + 13) % 256 AS bb
        |  FROM documents)
        |SELECT media_id, w AS width, h AS height,
        |  h * ((w // 2) * ra + (w - w // 2) * rb) AS sum_r,
        |  h * ((w // 2) * ga + (w - w // 2) * gb) AS sum_g,
        |  h * ((w // 2) * ba + (w - w // 2) * bb) AS sum_b
        |FROM r ORDER BY media_id""".stripMargin,
    // the PCM formula restated: n = 200 + id % 100 samples of
    // (id*31 + i*17) % 65536 - 32768 — exactly what the WAV parser
    // must hand back
    "q_mm_audio" ->
      """WITH r AS (
        |  SELECT doc_id AS media_id, 200 + doc_id % 100 AS n FROM documents),
        |s AS (
        |  SELECT media_id, n,
        |    list_transform(range(n),
        |      i -> (media_id * 31 + i * 17) % 65536 - 32768) AS v
        |  FROM r)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_sum(v) AS BIGINT) AS sum_samples,
        |  CAST(list_min(v) AS BIGINT) AS min_sample,
        |  CAST(list_max(v) AS BIGINT) AS max_sample
        |FROM s ORDER BY media_id""".stripMargin,
    // nearest-neighbor 8x8 thumbnail restated arithmetically: target
    // column x samples source column (x*w)//8, which carries the left
    // tone iff it lands under w//2; all 8 rows are color-uniform
    "q_mm_resize" ->
      """WITH r AS (
        |  SELECT doc_id AS media_id,
        |    (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h,
        |    (doc_id * 37) % 256 AS ra, (doc_id * 59) % 256 AS ga,
        |    (doc_id * 83) % 256 AS ba,
        |    (doc_id * 101 + 7) % 256 AS rb, (doc_id * 131 + 11) % 256 AS gb,
        |    (doc_id * 151 + 13) % 256 AS bb
        |  FROM documents),
        |n AS (
        |  SELECT r.*,
        |    len(list_filter(range(8), x -> (x * w) // 8 < w // 2)) AS n_left
        |  FROM r)
        |SELECT media_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  8 * (n_left * ra + (8 - n_left) * rb) AS sum_r,
        |  8 * (n_left * ga + (8 - n_left) * gb) AS sum_g,
        |  8 * (n_left * ba + (8 - n_left) * bb) AS sum_b
        |FROM n ORDER BY media_id""".stripMargin,
    // every aHash bit recomputed from character arithmetic (ASCII
    // corpus: ascii(char) == payload byte), then the banded join's
    // output restated as the EXHAUSTIVE all-pairs Hamming scan — equal
    // by the 4-band pigeonhole guarantee (ham <= 3 shares a band)
    "q_mm_neardup" ->
      """WITH m0 AS (SELECT doc_id AS media_id, text AS t FROM documents),
        |tw AS (
        |  SELECT doc_id + 3000000 AS media_id,
        |    substr(text, 1, length(text)//4) || '~' ||
        |    substr(text, length(text)//4 + 2,
        |      length(text)//2 - length(text)//4 - 1) || '~' ||
        |    substr(text, length(text)//2 + 2,
        |      (3*length(text))//4 - length(text)//2 - 1) || '~' ||
        |    substr(text, (3*length(text))//4 + 2) AS t
        |  FROM documents WHERE doc_id % 10 = 7),
        |m AS (SELECT * FROM m0 UNION ALL SELECT * FROM tw),
        |pos AS (
        |  SELECT media_id, t, length(t) AS n, unnest(range(length(t))) AS j
        |  FROM m),
        |ts AS (
        |  SELECT media_id, CAST((64*j) // n AS INT) AS tile,
        |    ascii(substr(t, CAST(j+1 AS INT), 1)) AS v
        |  FROM pos),
        |bs AS (SELECT media_id, tile, sum(v) AS sv FROM ts GROUP BY 1, 2),
        |tot AS (SELECT media_id, sum(sv) AS tv FROM bs GROUP BY 1),
        |bits AS (
        |  SELECT b.media_id, b.tile FROM bs b JOIN tot USING (media_id)
        |  WHERE sv * 64 > tv),
        |bands AS (
        |  SELECT media_id, tile // 16 AS bj,
        |    CAST(sum(CAST(1 AS BIGINT) << (tile % 16)) AS BIGINT) AS bv
        |  FROM bits GROUP BY 1, 2),
        |h AS (
        |  SELECT m.media_id,
        |    coalesce(max(CASE WHEN bj = 0 THEN bv END), 0) AS b0,
        |    coalesce(max(CASE WHEN bj = 1 THEN bv END), 0) AS b1,
        |    coalesce(max(CASE WHEN bj = 2 THEN bv END), 0) AS b2,
        |    coalesce(max(CASE WHEN bj = 3 THEN bv END), 0) AS b3
        |  FROM m LEFT JOIN bands USING (media_id) GROUP BY 1),
        |p AS (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b,
        |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
        |    bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS hamming
        |  FROM h a JOIN h b ON a.media_id < b.media_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM p WHERE hamming <= 2 ORDER BY id_a, id_b""".stripMargin,
    // every PIXEL-hash bit recomputed from the closed-form recipe:
    // thumbnail cell (x,y) samples source pixel ((x*w)//8, (y*h)//8)
    // (the engine's exact nearest-neighbor arithmetic — PNG and BMP
    // are lossless, so decoded pixels ARE the recipe), luma = the
    // integer channel sum, bit = 64*luma > total, then the banded
    // join restated as the exhaustive all-pairs Hamming scan
    "q_mm_phash_neardup" ->
      """WITH r AS (
        |  SELECT doc_id AS media_id, doc_id AS id,
        |    (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, doc_id,
        |    (doc_id % 13) + 4, (doc_id % 7) + 3
        |  FROM documents WHERE doc_id % 10 = 7),
        |g AS (SELECT unnest(range(8)) AS t),
        |lum AS (
        |  SELECT r.media_id, gy.t * 8 + gx.t AS tile,
        |    (r.id * 7 + 11 * ((gx.t * r.w) // 8)
        |       + 29 * ((gy.t * r.h) // 8)) % 256 +
        |    (r.id * 17 + 5 * ((gx.t * r.w) // 8)
        |       + 3 * ((gy.t * r.h) // 8)) % 256 +
        |    (r.id * 23 + 13 * ((gx.t * r.w) // 8)
        |       + 7 * ((gy.t * r.h) // 8)) % 256 AS l
        |  FROM r, g gx, g gy),
        |tot AS (SELECT media_id, sum(l) AS tv FROM lum GROUP BY 1),
        |bits AS (
        |  SELECT lum.media_id, tile FROM lum JOIN tot USING (media_id)
        |  WHERE l * 64 > tv),
        |bands AS (
        |  SELECT media_id, tile // 16 AS bj,
        |    CAST(sum(CAST(1 AS BIGINT) << (tile % 16)) AS BIGINT) AS bv
        |  FROM bits GROUP BY 1, 2),
        |hh AS (
        |  SELECT r.media_id,
        |    coalesce(max(CASE WHEN bj = 0 THEN bv END), 0) AS b0,
        |    coalesce(max(CASE WHEN bj = 1 THEN bv END), 0) AS b1,
        |    coalesce(max(CASE WHEN bj = 2 THEN bv END), 0) AS b2,
        |    coalesce(max(CASE WHEN bj = 3 THEN bv END), 0) AS b3
        |  FROM r LEFT JOIN bands USING (media_id) GROUP BY 1),
        |p AS (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b,
        |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
        |    bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS hamming
        |  FROM hh a JOIN hh b ON a.media_id < b.media_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM p WHERE hamming <= 2 ORDER BY id_a, id_b""".stripMargin)
}
