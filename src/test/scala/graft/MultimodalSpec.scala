package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaMeta, MediaRow}

/** Multimodal plumbing (stubbed codecs, real Spark shape): mime sniff,
  * resize kernel contract, video frame-sample fan-out. */
class MultimodalSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("mime sniffing from magic bytes") {
    assert(Multimodal.sniffMime(Array(0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0, 0, 0, 0, 0)) == "image/png")
    assert(Multimodal.sniffMime(Array(0xFF.toByte, 0xD8.toByte) ++ Array.fill(10)(0.toByte)) == "image/jpeg")
    assert(Multimodal.sniffMime("RIFFxxxxWEBP".getBytes) == "image/webp")
    assert(Multimodal.sniffMime("xxxxftypisom".getBytes) == "video/mp4")
    assert(Multimodal.sniffMime(Array[Byte](1, 2, 3)) == "application/octet-stream")
  }

  test("resize stub: dimensions and determinism") {
    val px = Array.tabulate(64 * 64)(i => i % 256)
    val small = Multimodal.resizeStub(px, 64, 64, 16, 16)
    assert(small.length == 16 * 16)
    assert(small.toSeq == Multimodal.resizeStub(px, 64, 64, 16, 16).toSeq)
    // corners map to corners under nearest-neighbor
    assert(small(0) == px(0))
  }

  test("real ImageIO decode: features from actual pixels") {
    // 32×16, left half black, right half white — every feature is
    // predictable from the pixels, not from payload bytes
    val img = new java.awt.image.BufferedImage(
      32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq(Multimodal.MediaRow(7L, out.toByteArray,
      MediaMeta("image/png", 32, 16, 3, 0L))).toDS()
    val f = Multimodal.imageFeatures(media, w = 32, h = 16).collect().head
    assert(f.decoded)
    assert(f.srcWidth == 32 && f.srcHeight == 16)
    assert(f.meanLuma == 127.5) // half 0, half 255
    assert(f.histogram(0) == 256 && f.histogram(7) == 256) // two spikes
    assert(f.histogram.sum == 512)
    // aHash: the right 4 of each 8-block row are the bright blocks
    assert(f.ahash == 0xF0F0F0F0F0F0F0F0L)
  }

  test("corpus image buckets (92/93/94) hold decodable deterministic images") {
    for (k <- Seq(92L, 93L, 94L)) {
      val bytes = graft.corpus.CorpusGen.payload(k)
      val img = Multimodal.decodeImage(bytes)
      assert(img != null, s"bucket $k did not decode")
      assert(img.getWidth >= 24 && img.getWidth <= 40)
      assert(img.getHeight >= 16 && img.getHeight <= 32)
      // byte-determinism: same index regenerates identical codec bytes
      assert(bytes.toSeq == graft.corpus.CorpusGen.payload(k).toSeq)
    }
    // gradient raster: mean luma sits mid-range, never degenerate
    val media = Seq(Multimodal.MediaRow(92L, graft.corpus.CorpusGen.payload(92L),
      MediaMeta("image/png", 0, 0, 3, 0L))).toDS()
    val f = Multimodal.imageFeatures(media).collect().head
    assert(f.decoded && f.meanLuma > 60 && f.meanLuma < 220)
    assert(f.ahash != 0L)
  }

  test("undecodable payloads fall back to the stub plane with decoded=false") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val media = Seq(Multimodal.MediaRow(1L, junk,
      MediaMeta("application/octet-stream", 0, 0, 0, 0L))).toDS()
    val f = Multimodal.imageFeatures(media).collect().head
    assert(!f.decoded && f.srcWidth == 0 && f.srcHeight == 0)
    assert(f.histogram.sum == 32 * 32) // stub plane is still total
  }

  test("frame sampling fans out one row per interval with event-time") {
    val media = Seq(
      MediaRow(1L, Array.tabulate(1000)(_.toByte), MediaMeta("video/mp4", 640, 480, 3, 5500L)),
      MediaRow(2L, Array.tabulate(100)(_.toByte), MediaMeta("video/mp4", 320, 240, 3, 900L)))
      .toDS()
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    val byId = frames.groupBy(_.id)
    assert(byId(1L).length == 5) // 5500ms at 1000ms -> frames 0..4
    assert(!byId.contains(2L))   // shorter than one interval
    assert(byId(1L).map(_.tsMs).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
    assert(frames.forall(_.payload.length <= 16))
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.map(f => (f.id, f.frameIndex, f.payload.toSeq)).toSet ==
      again.map(f => (f.id, f.frameIndex, f.payload.toSeq)).toSet)
  }
}
