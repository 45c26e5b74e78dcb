package graft.html

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Anchor (link) extraction from real HTML via the streaming tokenizer
  * — the bridge between content extraction and the link graph: hrefs
  * feed `ops.LinkGraph` edges and `ops.UrlFilter` frontier rules;
  * anchor TEXT is the classic relevance signal search and
  * quality-ranking pipelines aggregate per target.
  *
  * Semantics (WHATWG-aligned): a `<a>` start tag with a non-empty
  * `href` opens a capture; a new `<a>` implicitly closes any open one
  * (anchors never nest); `</a>` or end-of-document closes. Text from
  * ANY nested inline markup accumulates into the anchor text, which is
  * whitespace-collapsed and trimmed. Hrefs and text arrive
  * entity-decoded from the tokenizer.
  *
  * Scale shape: `anchorRows` is one typed flatMap stage — map-only,
  * rides the scan, no state across rows; downstream host roll-ups are
  * the usual (host, count) shuffles.
  */
object Anchors {

  private def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var inWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) inWs = true
      else {
        if (inWs && sb.nonEmpty) sb.append(' ')
        inWs = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** All (href, anchor_text) pairs in document order. */
  def extract(html: String): List[(String, String)] = {
    val out = List.newBuilder[(String, String)]
    var href: String = null
    val sb = new StringBuilder
    def close(): Unit =
      if (href != null) {
        out += ((href, collapseWs(sb.toString)))
        href = null
        sb.setLength(0)
      }
    HtmlTokenizer.tokenize(html).foreach {
      case HtmlTokenizer.StartTag("a", attrs, selfClosing) =>
        close()
        attrs.collectFirst { case ("href", v) if v.nonEmpty => v }
          .foreach { h =>
            if (selfClosing) out += ((h, "")) else href = h
          }
      case HtmlTokenizer.EndTag("a") => close()
      case HtmlTokenizer.Text(t) if href != null => sb.append(t)
      case _ => ()
    }
    close()
    out.result()
  }

  /** Explodes each row into (id, href, anchor_text) rows — one typed
    * flatMap, map-only. */
  def anchorRows(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        extract(Option(html).getOrElse(""))
          .map { case (h, t) => (id, h, t) }
      }
      .toDF(idCol, "href", "anchor_text")
  }
}
