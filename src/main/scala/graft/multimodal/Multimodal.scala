package graft.multimodal

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in fixed-size batches through a pluggable
  * decoder.
  *
  * This mirrors the reference's only external-compute stage — VEP — which
  * streams blocks of 1000 rows through an annotator process
  * (`hail_scripts/utils/hail_utils.py:113-139`, `block_size=1000`) and swaps
  * in a deterministic dummy runner under test
  * (`luigi_pipeline/lib/hail_vep_runners.py:15-28`). Here: the Spark-side
  * plumbing (schema, batching, partition mapping) is real; the media codecs
  * are not available in this environment, so [[StubDecoder]] is the
  * clearly-marked deterministic fake with the same interface a libjpeg/ffmpeg
  * binding would implement.
  */
final case class MediaMeta(
    mediaType: String, // "image" | "audio" | "video"
    width: Int,
    height: Int,
    durationMs: Long,
    codec: String)

final case class MediaRow(docId: Long, payload: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(
    docId: Long,
    byteLen: Long,
    /** 16-bin byte histogram, L1-normalized — the stand-in for real decoded
      * features (embedding, spectrogram stats, …). */
    histogram: Array[Float],
    /** sampled frame indices (video) or empty */
    frames: Array[Long],
    decoderVersion: String)

/** Batch decoder interface: one call per batch of ≤ batchSize rows — the
  * shape an external-process or JNI decoder needs (amortized startup, like
  * VEP's per-1000-row process). */
trait MediaDecoder extends Serializable {
  def version: String
  def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures]
}

/** Deterministic fake decoder (STUB — real image/audio libs are absent in
  * this sandbox; swap for a libjpeg/ffmpeg-backed implementation with the
  * same interface in production). */
object StubDecoder extends MediaDecoder {
  val version = "stub-decoder-1"

  def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
    val hist = new Array[Float](16)
    var i = 0
    while (i < r.payload.length) {
      hist((r.payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val n = math.max(1, r.payload.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    // frame sampling: one frame index per second of video, capped at 16
    val frames =
      if (r.meta.mediaType == "video" && r.meta.durationMs > 0)
        (0L until math.min(16L, r.meta.durationMs / 1000L)).map(_ * 1000L).toArray
      else Array.empty[Long]
    MediaFeatures(r.docId, r.payload.length.toLong, hist, frames, version)
  }
}

object Multimodal {

  val DefaultBatchSize = 1000 // the reference's VEP block size

  /** Feature extraction over a media Dataset: partitions are streamed in
    * batches of `batchSize` through the decoder — batch shape and schema are
    * the real contract; only the decoder body is stubbed. */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder,
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decoder.decodeBatch(batch))
    }
  }
}
