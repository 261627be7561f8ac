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
