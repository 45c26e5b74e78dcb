package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Mp4Meta, Multimodal}
import graft.ops.Multimodal.{MediaMeta, MediaRow}

/** From-scratch ISO-BMFF container parsing (ops.Mp4Meta), pinned against
  * the independent minimal box writer — real metadata, stubbed decode. */
class Mp4MetaSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("mvhd/tkhd/hdlr/stsd fields parse exactly from a synthesized tree") {
    val mp4 = Mp4Meta.synthMp4(timescale = 600L, duration = 1800L,
      Seq(("vide", "avc1", 640, 360), ("soun", "mp4a", 0, 0)))
    val m = Mp4Meta.parse(mp4)
    assert(m != null)
    assert(m.brand == "isom")
    assert(m.timescale == 600L)
    assert(m.durationMs == 3000L) // 1800 / 600 = 3 s
    assert(m.nTracks == 2 && m.hasVideo && m.hasAudio)
    assert(m.width == 640 && m.height == 360)
    assert(m.videoCodec == "avc1" && m.audioCodec == "mp4a")
  }

  test("audio-only container: no video track, no dimensions") {
    val m = Mp4Meta.parse(Mp4Meta.synthMp4(1000L, 2500L, Seq(("soun", "mp4a", 0, 0))))
    assert(m != null && m.nTracks == 1 && !m.hasVideo && m.hasAudio)
    assert(m.width == 0 && m.height == 0 && m.videoCodec == "")
    assert(m.durationMs == 2500L)
  }

  test("non-MP4 and truncated payloads return null, never throw") {
    assert(Mp4Meta.parse(null) == null)
    assert(Mp4Meta.parse("not an mp4 container at all".getBytes) == null)
    assert(Mp4Meta.parse(Array.tabulate(48)(j => (j * 5 % 251).toByte)) == null)
    val good = Mp4Meta.synthMp4(1000L, 1000L, Seq(("vide", "avc1", 64, 48)))
    // every truncation point must degrade gracefully (null or partial)
    (8 until good.length by 7).foreach { n =>
      Mp4Meta.parse(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // ftyp alone (no moov) is not a parseable movie
    assert(Mp4Meta.parse(java.util.Arrays.copyOf(good, 24)) == null)
  }

  test("videoFeatures dataset stage stays total over mixed payloads") {
    val rows = Seq(
      MediaRow(0L, Mp4Meta.synthMp4(1000L, 4000L,
        Seq(("vide", "avc1", 320, 240))), MediaMeta("video/mp4", 0, 0, 0, 0L)),
      MediaRow(1L, "junk".getBytes, MediaMeta("application/octet-stream", 0, 0, 0, 0L)))
    val out = Multimodal.videoFeatures(spark.createDataset(rows))
      .collect().sortBy(_.id)
    assert(out(0).parsed && out(0).durationMs == 4000L && out(0).hasVideo)
    assert(!out(1).parsed && out(1).durationMs == -1L)
  }

  test("sniffMime recognizes the synthesized container as video/mp4") {
    val mp4 = Mp4Meta.synthMp4(1000L, 1000L, Seq(("vide", "avc1", 64, 48)))
    assert(Multimodal.sniffMime(mp4) == "video/mp4")
  }
}
