package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 / WARC 1.1) container parsing — the
  * format Common-Crawl-style corpora actually arrive in. From-scratch:
  * record framing is driven by the `Content-Length` named field (never
  * a delimiter scan, so bodies containing `WARC/1.1` or blank lines
  * parse correctly), named fields are case-insensitive with RFC-822
  * continuation-line folding, and the two-CRLF record trailer is
  * consumed after each block. Per-record gzip members (the layout
  * Common Crawl ships: each record an independent gzip stream,
  * concatenated) are detected by magic bytes and inflated member by
  * member before framing.
  *
  * The HTTP payload of `response` records is split at the first blank
  * line: status code from the status line, headers case-insensitively,
  * `Content-Type` broken into media type + `charset` parameter.
  *
  * Scale shape: `responses` is ONE typed flatMap over the blob column
  * — map-only, streaming over each byte array, no shuffle; a 1000-
  * executor crawl ingests WARC shards embarrassingly parallel and the
  * frame/HTTP split never materializes more than one record.
  */
object Warc {

  final case class Record(warcType: String, headers: Map[String, String],
                          body: Array[Byte])

  final case class Http(status: Int, headers: Map[String, String],
                        body: Array[Byte])

  private val GzipMagic = 0x8b1f

  /** Inflate concatenated gzip members if the blob starts with the
    * gzip magic; otherwise return as-is. GZIPInputStream handles
    * member concatenation natively. */
  def maybeGunzip(blob: Array[Byte]): Array[Byte] = {
    if (blob.length < 2 ||
      ((blob(0) & 0xff) | ((blob(1) & 0xff) << 8)) != GzipMagic) return blob
    val in = new GZIPInputStream(new ByteArrayInputStream(blob))
    val out = new ByteArrayOutputStream(blob.length * 4)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Index of the first CRLF at/after `from`, or -1. */
  private def crlfAt(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse a header block (WARC named fields or HTTP headers) starting
    * at `from`; returns (lower-cased-key map, offset just past the
    * blank line). Continuation lines (SP/HTAB lead) fold into the
    * previous field with a single space. */
  private def parseHeaders(b: Array[Byte], from: Int):
      (Map[String, String], Int) = {
    val h = mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var pos = from
    var done = false
    while (!done) {
      val eol = crlfAt(b, pos)
      if (eol < 0) { pos = b.length; done = true }
      else if (eol == pos) { pos = eol + 2; done = true } // blank line
      else {
        val line = new String(b, pos, eol - pos, StandardCharsets.UTF_8)
        if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') &&
          lastKey != null) {
          h(lastKey) = h(lastKey) + " " + line.trim
        } else {
          val colon = line.indexOf(':')
          if (colon > 0) {
            val k = line.substring(0, colon).trim
              .toLowerCase(java.util.Locale.ROOT)
            h(k) = line.substring(colon + 1).trim
            lastKey = k
          }
        }
        pos = eol + 2
      }
    }
    (h.toMap, pos)
  }

  /** All records in a (possibly per-record-gzipped) WARC blob.
    * Malformed trailing garbage ends the parse rather than throwing —
    * a crawl shard's tail truncation must not kill the task. */
  def parseAll(blob: Array[Byte]): List[Record] = {
    val b = maybeGunzip(blob)
    val out = mutable.ListBuffer.empty[Record]
    var pos = 0
    var ok = true
    while (ok && pos < b.length) {
      val eol = crlfAt(b, pos)
      if (eol < 0 || !new String(b, pos, eol - pos, StandardCharsets.UTF_8)
          .startsWith("WARC/")) { ok = false }
      else {
        val (headers, bodyStart) = parseHeaders(b, eol + 2)
        val len = headers.get("content-length").flatMap(_.toLongOption)
        len match {
          case Some(n) if bodyStart + n <= b.length =>
            val body = java.util.Arrays.copyOfRange(
              b, bodyStart, bodyStart + n.toInt)
            out += Record(
              headers.getOrElse("warc-type", ""), headers, body)
            pos = bodyStart + n.toInt
            // consume the two-CRLF record trailer if present
            if (crlfAt(b, pos) == pos) pos += 2
            if (crlfAt(b, pos) == pos) pos += 2
          case _ => ok = false
        }
      }
    }
    out.toList
  }

  /** Split an HTTP message: status from the status line, headers,
    * body after the first blank line. */
  def parseHttp(bytes: Array[Byte]): Http = {
    val eol = crlfAt(bytes, 0)
    if (eol < 0) return Http(0, Map.empty, Array.emptyByteArray)
    val statusLine = new String(bytes, 0, eol, StandardCharsets.UTF_8)
    val parts = statusLine.split(" ", 3)
    val status =
      if (parts.length >= 2) parts(1).toIntOption.getOrElse(0) else 0
    val (headers, bodyStart) = parseHeaders(bytes, eol + 2)
    Http(status, headers,
      java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length))
  }

  /** `media/type; charset=x` → (media type lower, charset lower or ""). */
  def splitContentType(ct: String): (String, String) = {
    val parts = ct.split(";")
    val mime = parts(0).trim.toLowerCase(java.util.Locale.ROOT)
    val charset = parts.iterator.drop(1).map(_.trim)
      .collectFirst {
        case p if p.toLowerCase(java.util.Locale.ROOT)
          .startsWith("charset=") =>
          p.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
            .toLowerCase(java.util.Locale.ROOT)
      }.getOrElse("")
    (mime, charset)
  }

  /** Serialize one WARC 1.1 record (writer side — archiving fetched
    * pages). Content-Length is computed; the two-CRLF trailer is
    * appended. */
  def writeRecord(warcType: String, fields: Seq[(String, String)],
                  body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    fields.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head); out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** One gzip member (per-record compression, Common Crawl layout). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** blob column → one row per `response` record: (url, warc_date,
    * status, mime, charset, body UTF-8). warcinfo/request/metadata
    * records are framed and skipped. One typed flatMap, map-only. */
  def responses(df: DataFrame, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(blobCol).cast("binary"))
      .as[Array[Byte]]
      .flatMap { blob =>
        parseAll(Option(blob).getOrElse(Array.emptyByteArray))
          .iterator
          .filter(_.warcType == "response")
          .map { r =>
            val http = parseHttp(r.body)
            val (mime, charset) = splitContentType(
              http.headers.getOrElse("content-type", ""))
            (r.headers.getOrElse("warc-target-uri", ""),
              r.headers.getOrElse("warc-date", ""),
              http.status, mime, charset,
              new String(http.body, StandardCharsets.UTF_8))
          }
      }
      .toDF("url", "warc_date", "status", "mime", "charset", "body")
  }
}
