package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * batched per-partition stages.
  *
  * IMAGE decode is REAL: the JDK's built-in `javax.imageio` readers
  * (PNG/JPEG/GIF/BMP/TIFF/WBMP — no external libraries) decode the
  * payload, and width/height/mean-luma/histogram/average-hash are
  * computed from actual pixels. Payloads ImageIO cannot read (audio,
  * video, corrupt bytes) fall back to `decodeImageStub`, a deterministic
  * fake plane, with `decoded = false` on the feature row — the pipeline
  * shape stays total. Audio/video codecs remain out of scope (the JDK
  * ships none); their plumbing (frame sampling, metadata) is the real
  * contract with stubbed byte-slicing. */
object Multimodal {

  // ImageIO's default ImageInputStream cache writes temp files; 32
  // executor threads decoding tiny in-memory payloads want the heap path
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(mime: String, width: Int, height: Int,
      channels: Int, durationMs: Long)
  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(id: Long, width: Int, height: Int,
      srcWidth: Int, srcHeight: Int, decoded: Boolean,
      meanLuma: Double, histogram: Seq[Long], ahash: Long)

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

  /** Decode an image payload with the JDK's built-in readers. Returns
    * null when the bytes are not a decodable image (ImageIO probes
    * registered readers by content) — callers fall back to the stub so
    * the partition map stays total over mixed-media tables. */
  def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    if (payload == null || payload.length < 8) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null } // truncated/corrupt payloads
  }

  /** Nearest-neighbor grayscale resample of a decoded image to a w×h
    * luma plane (integer Rec.601 weights — deterministic, no float
    * rounding; values 0-255). The downsample-before-featurize step every
    * image pipeline runs so feature cost is O(w·h), not O(megapixels). */
  def lumaPlane(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] = {
    val sw = img.getWidth
    val sh = img.getHeight
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * sh / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x * sw / w, sy)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        out(y * w + x) = (r * 299 + g * 587 + b * 114) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit average hash (aHash): 8×8 block means over the luma plane,
    * bit set where the block mean ≥ the global mean of the 64 blocks.
    * The standard perceptual-dedup baseline (DCT pHash is a drop-in
    * upgrade on the same plane). */
  def averageHash(px: Array[Int], w: Int, h: Int): Long = {
    if (w < 8 || h < 8) return 0L
    val blocks = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bi = by * 8 + x * 8 / w
        blocks(bi) += px(y * w + x)
        counts(bi) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i =>
      if (counts(i) == 0) 0.0 else blocks(i).toDouble / counts(i))
    val mean = means.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (means(i) >= mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** STUB decode: deterministic fake "pixels" derived from payload bytes
    * — the fallback plane for payloads ImageIO cannot read (audio/video/
    * corrupt), keeping the feature stage total and deterministic. */
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
    * (the mapInPandas analog — decode context and feature loops live in
    * the partition closure, never a per-row UDF). Decodes REAL pixels
    * via ImageIO; undecodable payloads take the deterministic stub plane
    * and report decoded = false. */
  def imageFeatures(media: Dataset[MediaRow], w: Int = 32, h: Int = 32): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(r.payload)
        val (px, srcW, srcH, decoded) =
          if (img != null) (lumaPlane(img, w, h), img.getWidth, img.getHeight, true)
          else (decodeImageStub(r.payload, w, h), 0, 0, false)
        var sum = 0L
        val hist = new Array[Long](8)
        var i = 0
        while (i < px.length) {
          sum += px(i)
          hist(px(i) >> 5) += 1
          i += 1
        }
        val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
        ImageFeatures(r.id, w, h, srcW, srcH, decoded, mean, hist.toSeq,
          averageHash(px, w, h))
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
