package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payloads plus a typed metadata struct —
  * the layout a 100 TB multimodal corpus actually uses (payload bytes
  * inline or as object-store pointers; schema'd metadata for pruning).
  * The Spark-side plumbing (schema, batching, partition-parallel decode,
  * feature schema) is real and tested; the *codec* itself is a
  * clearly-marked deterministic STUB because no image/audio libraries
  * exist in this container — swap `stubDecode` for an actual decoder
  * (e.g. JNI/FFI into libjpeg/ffmpeg) without touching the plumbing.
  */
object Multimodal {

  /** Media row: payload + typed metadata (modality, dims, sample rate). */
  case class MediaMeta(modality: String, width: Int, height: Int, sampleRateHz: Int)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
      features: Array[Float])
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB decode: a real implementation would decode the payload with a
    * native codec. This deterministic fake derives a fixed-size feature
    * vector from the bytes so the distributed plumbing is fully testable. */
  private[ext] def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) {
      h = h * 0x100000001b3L ^ payload(i)
      out(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Per-partition batched "decode + featurize": the Scala analogue of a
    * `mapInPandas` pipeline — one iterator pass per partition, constant
    * memory, no driver involvement. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val feats = stubDecode(row.payload, dim) // STUB: real codec goes here
        MediaFeatures(row.media_id, row.meta.modality, row.payload.length, feats)
      }
    }
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th
    * fixed-size chunk (flatMap ⇒ streaming, no row blow-up in memory). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameBytes >= 1 && stride >= 1, "frameBytes and stride must be >= 1")
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % stride == 0 => MediaFrame(row.media_id, idx, chunk) }
    }
  }

  /** STUB resize: a real implementation decodes, rescales (e.g. bilinear)
    * and re-encodes via a native codec. The stub emulates the data-flow
    * cost shape — payload in, smaller payload + updated metadata out —
    * by deterministic byte stride-sampling to `targetWidth` columns.
    * The Spark plumbing (narrow map, metadata update, no shuffle) is the
    * real part. */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val w = math.max(1, row.meta.width)
      if (w <= targetWidth) row
      else {
        val stride = w.toDouble / targetWidth
        val rows = math.max(1, row.payload.length / w)
        val out = new Array[Byte](targetWidth * rows)
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < targetWidth) {
            out(r * targetWidth + c) = row.payload(
              math.min(row.payload.length - 1, r * w + (c * stride).toInt))
            c += 1
          }
          r += 1
        }
        MediaRow(row.media_id, out, row.meta.copy(width = targetWidth))
      }
    }
  }

  /** Build a demo media table from any table with an id + string column
    * (payload = UTF-8 bytes standing in for encoded media). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        val bytes = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
        MediaRow(id, bytes, MediaMeta("image", width = bytes.length min 64, height = 1, sampleRateHz = 0))
    }
  }
}
