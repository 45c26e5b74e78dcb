package graft.ops

/** From-scratch ISO BMFF (MP4) container metadata parser — the video
  * analog of the PDF header walk: the JDK ships no video CODEC, but the
  * container structure (ISO/IEC 14496-12, public spec) is plain nested
  * boxes, so brand, duration, track count/kinds, visual dimensions and
  * sample-format fourcc are all REAL parsed metadata. Frame DECODE stays
  * stubbed ([[Multimodal.sampleFrames]]); everything a pipeline filters
  * or partitions on (duration bands, has-video, codec allowlists) comes
  * from actual bytes.
  *
  * Box grammar: [size:u32 BE][type:4cc][payload]; size==1 → u64
  * largesize follows; size==0 → box runs to end of enclosing range.
  * Containers walked: moov, trak, mdia, minf, stbl. Leaves read: mvhd
  * (v0/v1 timescale+duration), tkhd (v0/v1 — width/height as 16.16
  * fixed), hdlr (handler type), stsd (first sample-entry fourcc). */
object Mp4Meta {

  final case class TrackMeta(handler: String, codec: String,
      width: Int, height: Int)
  final case class VideoMeta(brand: String, timescale: Long, durationMs: Long,
      nTracks: Int, hasVideo: Boolean, hasAudio: Boolean,
      width: Int, height: Int, videoCodec: String, audioCodec: String)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** Parse container metadata; null when the bytes are not an MP4
    * (missing/garbled box structure) — callers fall back to a stub row,
    * mirroring the image/audio decode contract. */
  def parse(payload: Array[Byte]): VideoMeta = {
    if (payload == null || payload.length < 16) return null
    if (fourcc(payload, 4) != "ftyp") return null
    try {
      var brand = ""
      var timescale = 0L
      var duration = -1L
      var nTracks = 0
      var tracks = List.empty[TrackMeta]

      // per-track accumulation state, reset at each trak
      var tHandler = ""
      var tCodec = ""
      var tW = 0
      var tH = 0

      def walk(start: Int, end: Int, depth: Int): Unit = {
        var i = start
        while (i + 8 <= end) {
          var size = u32(payload, i)
          val typ = fourcc(payload, i + 4)
          var hdr = 8
          if (size == 1L && i + 16 <= end) { size = u64(payload, i + 8); hdr = 16 }
          else if (size == 0L) size = (end - i).toLong
          if (size < hdr || i + size > end) return // garbled — stop this range
          val body = i + hdr
          val bodyEnd = (i + size).toInt
          typ match {
            case "ftyp" if body + 4 <= bodyEnd =>
              brand = fourcc(payload, body)
            case "moov" | "mdia" | "minf" | "stbl" =>
              walk(body, bodyEnd, depth + 1)
            case "trak" =>
              tHandler = ""; tCodec = ""; tW = 0; tH = 0
              nTracks += 1
              walk(body, bodyEnd, depth + 1)
              tracks ::= TrackMeta(tHandler, tCodec, tW, tH)
            case "mvhd" if body + 4 <= bodyEnd =>
              val v = payload(body) & 0xFF
              if (v == 1 && body + 28 <= bodyEnd) {
                timescale = u32(payload, body + 20)
                duration = u64(payload, body + 24)
              } else if (v == 0 && body + 20 <= bodyEnd) {
                timescale = u32(payload, body + 12)
                duration = u32(payload, body + 16)
              }
            case "tkhd" if body + 4 <= bodyEnd =>
              val v = payload(body) & 0xFF
              // width/height are the LAST 8 bytes of the box, 16.16 fixed
              if (bodyEnd - 8 >= body) {
                tW = (u32(payload, bodyEnd - 8) >> 16).toInt
                tH = (u32(payload, bodyEnd - 4) >> 16).toInt
              }
              val _ = v // layout difference only shifts fields we read from the end
            case "hdlr" if body + 12 <= bodyEnd =>
              tHandler = fourcc(payload, body + 8)
            case "stsd" if body + 16 <= bodyEnd =>
              // version/flags(4) + entry_count(4) + first entry size(4)+fourcc(4)
              tCodec = fourcc(payload, body + 12)
            case _ => () // skip unknown boxes (free, mdat, udta, ...)
          }
          i = bodyEnd
        }
      }
      walk(0, payload.length, 0)
      if (timescale <= 0 && nTracks == 0) return null // ftyp alone is not enough
      val durationMs =
        if (timescale > 0 && duration >= 0) duration * 1000L / timescale else -1L
      val ts = tracks.reverse
      val vid = ts.find(_.handler == "vide")
      val aud = ts.find(_.handler == "soun")
      VideoMeta(brand, timescale, durationMs, nTracks,
        vid.isDefined, aud.isDefined,
        vid.map(_.width).getOrElse(0), vid.map(_.height).getOrElse(0),
        vid.map(_.codec).getOrElse(""), aud.map(_.codec).getOrElse(""))
    } catch { case _: Exception => null }
  }

  /** Deterministic minimal MP4 writer (ftyp + moov/mvhd + one trak per
    * entry with tkhd/mdia/mdhd/hdlr/minf/stbl/stsd) — fixture generator
    * so the parser is tested against an independently constructed box
    * tree, like the WAV writer vs AudioSystem. `tracks` entries are
    * (handlerFourcc, codecFourcc, width, height). */
  def synthMp4(timescale: Long, duration: Long,
      tracks: Seq[(String, String, Int, Int)]): Array[Byte] = {
    def cc(s: String): Array[Byte] = {
      require(s.length == 4, s"fourcc must be 4 chars: $s")
      s.getBytes("ISO-8859-1")
    }
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ cc(typ) ++ payload

    val ftyp = box("ftyp", cc("isom") ++ be32(0) ++ cc("isom") ++ cc("mp41"))
    // mvhd v0: vf(4) ctime(4) mtime(4) timescale(4) duration(4) + the
    // rate/volume/matrix/next-track tail (76 bytes of fixed-point
    // defaults the parser doesn't read — zeros are structurally valid)
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        new Array[Byte](76))
    val traks = tracks.map { case (handler, codec, w, h) =>
      // tkhd v0: vf ctime mtime trackID reserved duration ... width height
      val tkhdBody = be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(duration) ++ new Array[Byte](52) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16)
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc(handler) ++
        new Array[Byte](12) ++ Array[Byte](0))
      val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(duration) ++ be32(0x55C40000L & 0xFFFF0000L))
      val sampleEntry = be32(16) ++ cc(codec) ++ new Array[Byte](8)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ sampleEntry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", box("tkhd", tkhdBody) ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.foldLeft(Array.emptyByteArray)(_ ++ _))
    // a token mdat so the file shape matches real captures
    val mdat = box("mdat", Array.tabulate(32)(j => (j * 11 % 127).toByte))
    ftyp ++ moov ++ mdat
  }
}
