package graft.ops

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Charset detection + decode for raw fetched bytes, in the WHATWG
  * encoding-sniffing order a browser (and therefore a faithful web
  * pipeline) uses:
  *
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
  *   2. transport-declared charset (the HTTP Content-Type parameter,
  *      e.g. from `Warc.responses`);
  *   3. `charset=` prescan of the first 1024 bytes (the `<meta
  *      charset>` / http-equiv declaration, readable as ASCII in any
  *      ASCII-compatible encoding);
  *   4. strict UTF-8 validation (malformed input REPORTs, never
  *      replaces);
  *   5. windows-1252 fallback — the WHATWG default for the web; it
  *      decodes every byte, so decoding never fails.
  *
  * The `how` tag (bom/declared/meta/utf8/fallback) makes the decision
  * auditable per document. Complements `extract.Extractor`'s frozen
  * BOM handling: this op is the standalone front-end for payloads
  * arriving with transport metadata.
  *
  * Scale shape: one typed map per document — map-only, rides the scan.
  */
object Encoding {

  private val MetaCharset =
    """(?i)charset\s*=\s*["']?([A-Za-z0-9_\-]+)""".r

  private def charsetFor(name: String): Option[Charset] = {
    val n = name.trim.toLowerCase(Locale.ROOT) match {
      case "latin1" | "latin-1" => "iso-8859-1"
      case other => other
    }
    try { if (n.isEmpty) None else Some(Charset.forName(n)) }
    catch { case _: Exception => None }
  }

  private def decodeWith(b: Array[Byte], from: Int, cs: Charset): String =
    new String(b, from, b.length - from, cs)

  private def strictUtf8(b: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** (decoded text, charset used, how it was chosen). */
  def decode(blob: Array[Byte], declared: String): (String, String, String) = {
    val b = if (blob == null) Array.emptyByteArray else blob
    // 1. BOM
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
      b(2) == 0xBF.toByte)
      return (decodeWith(b, 3, StandardCharsets.UTF_8), "utf-8", "bom")
    if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      return (decodeWith(b, 2, StandardCharsets.UTF_16LE), "utf-16le", "bom")
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      return (decodeWith(b, 2, StandardCharsets.UTF_16BE), "utf-16be", "bom")
    // 2. transport-declared
    charsetFor(Option(declared).getOrElse("")).foreach { cs =>
      return (decodeWith(b, 0, cs),
        cs.name().toLowerCase(Locale.ROOT), "declared")
    }
    // 3. meta prescan of the first 1024 bytes
    val head = new String(b, 0, math.min(1024, b.length),
      StandardCharsets.ISO_8859_1)
    MetaCharset.findFirstMatchIn(head)
      .flatMap(m => charsetFor(m.group(1))).foreach { cs =>
        return (decodeWith(b, 0, cs),
          cs.name().toLowerCase(Locale.ROOT), "meta")
      }
    // 4. strict UTF-8
    strictUtf8(b).foreach(t => return (t, "utf-8", "utf8"))
    // 5. WHATWG fallback
    (decodeWith(b, 0, Charset.forName("windows-1252")),
      "windows-1252", "fallback")
  }

  /** (id, blob, declared) → (id, text, charset, how) — one typed map,
    * map-only. */
  def decodeRows(df: DataFrame, idCol: String, blobCol: String,
                 declaredCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"),
        col(declaredCol).cast("string"))
      .as[(Long, Array[Byte], String)]
      .map { case (id, blob, declared) =>
        val (text, cs, how) = decode(blob, declared)
        (id, text, cs, how)
      }
      .toDF(idCol, "text", "charset", "how")
  }
}
