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
