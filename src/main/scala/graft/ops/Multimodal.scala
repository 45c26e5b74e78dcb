package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * batched per-partition stages.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeImageStub` produces a deterministic fake decode
  * from the payload bytes. The Spark-side contract — schema, batch
  * shape, partition-level batching, metadata struct — is real and
  * tested; swap the stub for a real codec on a production cluster. */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int,
      channels: Int, durationMs: Long)
  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(id: Long, width: Int, height: Int,
      meanLuma: Double, histogram: Seq[Long], phash: Long)

  /** Sniff media type from magic bytes (PNG/JPEG/GIF/RIFF-WebP/MP4). */
  def sniffMime(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 12) return "application/octet-stream"
    def at(i: Int, v: Int): Boolean = (bytes(i) & 0xFF) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "image/png"
    else if (at(0, 0xFF) && at(1, 0xD8)) "image/jpeg"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F')) "image/gif"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
             at(8, 'W') && at(9, 'E') && at(10, 'B') && at(11, 'P')) "image/webp"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p')) "video/mp4"
    else "application/octet-stream"
  }

  /** STUB decode: deterministic fake "pixels" derived from payload bytes.
    * Real implementation would be an image codec; the shape (w*h lumas)
    * and determinism are what the pipeline contract needs. */
  def decodeImageStub(payload: Array[Byte], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = payload(i % payload.length) & 0xFF
      i += 1
    }
    out
  }

  /** Feature extraction over a media table: per-partition batched map
    * (the mapInPandas analog — one decode context per partition, rows
    * processed in a tight loop, never a per-row UDF closure). */
  def imageFeatures(media: Dataset[MediaRow], w: Int = 32, h: Int = 32): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (real codec would allocate its context here)
      rows.map { r =>
        val px = decodeImageStub(r.payload, w, h)
        var sum = 0L
        val hist = new Array[Long](8)
        var i = 0
        while (i < px.length) {
          sum += px(i)
          hist(px(i) >> 5) += 1
          i += 1
        }
        val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
        // perceptual-hash stub: sign of (pixel - mean) over the first 64 px
        var ph = 0L
        i = 0
        while (i < 64 && i < px.length) {
          if (px(i) >= mean) ph |= (1L << i)
          i += 1
        }
        ImageFeatures(r.id, w, h, mean, hist.toSeq, ph)
      }
    }
  }

  /** STUB resize: nearest-neighbor downsample of the fake luma plane —
    * the partitioning/batching contract of a real resize kernel. */
  def resizeStub(px: Array[Int], w0: Int, h0: Int, w1: Int, h1: Int): Array[Int] = {
    val out = new Array[Int](w1 * h1)
    if (w0 <= 0 || h0 <= 0) return out
    var y = 0
    while (y < h1) {
      val sy = y * h0 / h1
      var x = 0
      while (x < w1) {
        out(y * w1 + x) = px(sy * w0 + (x * w0 / w1))
        x += 1
      }
      y += 1
    }
    out
  }

  final case class FrameRow(id: Long, frameIndex: Int, tsMs: Long,
      payload: Array[Byte])

  /** Frame sampling for video payloads: one row per sampled timestamp
    * (every `everyMs` through meta.durationMs), fanning out via a typed
    * flatMap. The decode is STUBBED — each frame's payload is a
    * deterministic slice of the source bytes — but the shape (explode to
    * frame grain, frame index + event-time column for downstream
    * windowing, per-partition batching) is the real pipeline contract. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val dur = math.max(0L, r.meta.durationMs)
      val n = (dur / everyMs).toInt
      (0 until n).map { k =>
        val ts = k * everyMs
        val bytes = r.payload
        val slice =
          if (bytes == null || bytes.isEmpty) Array.emptyByteArray
          else {
            val start = ((ts.toDouble / math.max(1L, dur)) * bytes.length).toInt
              .min(math.max(0, bytes.length - 16))
            java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + 16))
          }
        FrameRow(r.id, k, ts, slice)
      }
    }
  }

  /** Attach a metadata struct column to a raw (id, payload) binary table. */
  def withMediaMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val mimeUdf = udf(sniffMime _)
    df.withColumn("mime", mimeUdf(col(payloadCol)))
      .withColumn("size_bytes", when(col(payloadCol).isNull, 0L)
        .otherwise(length(col(payloadCol)).cast("long")))
  }
}
