package graft.corpus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** Deterministic Common-Crawl-style corpus synthesizer (FIXTURES.md §1).
  * Seed-fixed (42), wall-clock-free; every row is a pure function of its
  * index, so any scale regenerates byte-identically and generation can be
  * distributed via spark.range(n).map(row). Schema per BASELINE.json
  * input_hint: (url, warc_ts, html BINARY, text, lang).
  *
  * Payload mix per 100 rows: 70 HTML, 20 PDF, 2 empty/whitespace,
  * 3 image-magic payloads (png/jpg/gif — exercise the S8 unsupported
  * gate), 5 adversarial (truncated markup, unclosed script, bad
  * entities, non-UTF8 bytes, mega-doc for the skew path).
  *
  * The expected main-content extraction per url is known BY CONSTRUCTION
  * (the generator authored the boilerplate and the content separately) —
  * `expectedText(i)` is the byte-identity contract the tests assert
  * (north rule: byte-identical extracted text per url).
  */
object CorpusGen {

  final case class CorpusRow(url: String, warc_ts: Timestamp,
      html: Array[Byte], text: String, lang: String)

  val Seed = 42L
  private val Epoch = 1767225600000L // 2026-01-01T00:00:00Z, fixed (no now())

  private val langs = Array("en", "fr", "de", "es", "unknown")

  private val wordPool: Map[String, Array[String]] = Map(
    "en" -> Array("report", "analysis", "results", "system", "contract", "invoice",
      "total", "amount", "payment", "quarterly", "revenue", "growth", "market",
      "customer", "product", "service", "delivery", "network", "platform",
      "performance", "quality", "process", "management", "project", "budget",
      "review", "summary", "architecture", "pipeline", "cluster", "storage",
      "policy", "training", "model", "evaluation", "baseline", "metric"),
    "fr" -> Array("rapport", "analyse", "résultats", "système", "contrat", "facture",
      "total", "montant", "paiement", "trimestriel", "revenu", "croissance",
      "marché", "client", "produit", "service", "livraison", "réseau",
      "plateforme", "performance", "qualité", "processus", "gestion", "projet",
      "budget", "revue", "synthèse", "architecture", "données", "stockage"),
    "de" -> Array("bericht", "analyse", "ergebnisse", "system", "vertrag", "rechnung",
      "gesamt", "betrag", "zahlung", "quartal", "umsatz", "wachstum", "markt",
      "kunde", "produkt", "dienst", "lieferung", "netzwerk", "plattform",
      "leistung", "qualität", "prozess", "verwaltung", "projekt", "budget"),
    "es" -> Array("informe", "análisis", "resultados", "sistema", "contrato",
      "factura", "total", "importe", "pago", "trimestral", "ingresos",
      "crecimiento", "mercado", "cliente", "producto", "servicio", "entrega",
      "red", "plataforma", "rendimiento", "calidad", "proceso", "gestión"))

  private val fillerPool: Map[String, Array[String]] = Map(
    "en" -> Array("the", "and", "of", "to", "in", "is", "that", "for", "with", "this"),
    "fr" -> Array("le", "la", "les", "de", "et", "est", "pour", "dans", "que", "avec"),
    "de" -> Array("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "nicht"),
    "es" -> Array("el", "la", "de", "que", "en", "por", "con", "para", "es", "los"))

  def langOf(i: Long): String = langs((i % langs.length).toInt)
  private def poolLang(i: Long): String = {
    val l = langOf(i); if (wordPool.contains(l)) l else "en"
  }

  def urlOf(i: Long): String = {
    val host = (i % 20).toInt
    val kind = i % 100 match {
      case k if k < 70 => "article"
      case k if k < 90 => "doc"
      case k if k < 95 => "empty"
      case _ => "edge"
    }
    s"https://host$host.example/$kind/$i"
  }

  def tsOf(i: Long): Timestamp = new Timestamp(Epoch + i * 37000L)

  private def rng(i: Long): java.util.Random = new java.util.Random(Seed * 1000003L + i)

  /** A deterministic sentence of `n` words; ~1 in 6 words is a filler
    * function word (drives language-ID), some capitalized / numeric. */
  private def sentence(r: java.util.Random, lang: String, n: Int): String = {
    val pool = wordPool(lang)
    val filler = fillerPool(lang)
    val words = (0 until n).map { k =>
      val w =
        if (k % 3 == 1) filler(r.nextInt(filler.length))
        else pool(r.nextInt(pool.length))
      if (k == 0) w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + w.substring(1)
      else if (r.nextInt(20) == 0) (1000 + r.nextInt(9000)).toString
      else w
    }
    words.mkString(" ") + "."
  }

  private def paragraph(r: java.util.Random, lang: String, sentences: Int): String =
    (0 until sentences).map(_ => sentence(r, lang, 8 + r.nextInt(12))).mkString(" ")

  private def escapeHtml(s: String): String =
    s.flatMap { case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"; case c => c.toString }

  // ------------------------------------------------------------- HTML rows

  /** Main content for HTML row i: (title, paragraphs). */
  def htmlContent(i: Long): (String, Seq[String]) = {
    val r = rng(i)
    val lang = poolLang(i)
    val pool = wordPool(lang)
    val title = s"${pool(r.nextInt(pool.length)).capitalize} ${pool(r.nextInt(pool.length))} ${i}"
    val nPara = if (i % 100 == 99) 40 else 2 + r.nextInt(4)
    val paraLen = if (i % 100 == 99) 60 else 3 + r.nextInt(4) // mega-doc row
    val paras = (0 until nPara).map(_ => paragraph(r, lang, paraLen))
    (title, paras)
  }

  /** Boilerplate-wrapped page. Structural containers (nav/header/footer/
    * aside) and link-farm divs hold the boilerplate; the content sits in
    * <main> as h1 + <p> blocks. */
  def htmlPayload(i: Long): String = {
    val (title, paras) = htmlContent(i)
    val r = rng(i * 31 + 7)
    val navLinks = (0 until 6).map(k => s"""<a href="/section$k">Section $k news</a>""").mkString(" | ")
    val related = (0 until 5).map(k => s"""<li><a href="/rel/$k">Related story number $k about things</a></li>""").mkString("\n")
    val adWords = (0 until 8).map(_ => "sponsored").mkString(" ")
    val paraHtml = paras.map { p =>
      val body = escapeHtml(p)
      s"  <p>\n    $body\n  </p>"
    }.mkString("\n")
    val comment = if (r.nextBoolean()) "<!-- rendered by corpusgen -->" else ""
    s"""<!DOCTYPE html>
<html lang="${langOf(i)}">
<head>
<title>${escapeHtml(title)} — host${i % 20}</title>
<meta charset="utf-8">
<style>body { margin: 0; } .ad { color: red; }</style>
<script>var tracker = "<div>not real</div>"; track();</script>
</head>
<body>
<header><div class="sitename">Host${i % 20} Daily Chronicle</div></header>
<nav>$navLinks</nav>
$comment
<main>
  <h1>${escapeHtml(title)}</h1>
$paraHtml
</main>
<aside class="ad">$adWords advertisement banner offer deal</aside>
<div class="related"><ul>
$related
</ul></div>
<footer>Copyright 2026 Host${i % 20} Media. All rights reserved. <a href="/terms">Terms</a></footer>
</body>
</html>"""
  }

  // -------------------------------------------------------------- PDF rows

  /** PDF row i: page line matrix (each page = lines of ASCII text). */
  def pdfLines(i: Long): Seq[Seq[String]] = {
    val r = rng(i)
    val nPages = 1 + (i % 3).toInt
    (0 until nPages).map { p =>
      val nLines = 4 + r.nextInt(6)
      (0 until nLines).map { l =>
        // ASCII-only for the closed-world Latin-1 contract
        val en = wordPool("en")
        val words = (0 until 5 + r.nextInt(6)).map(_ => en(r.nextInt(en.length)))
        s"${words.mkString(" ")} p${p + 1}l${l + 1}"
      }
    }
  }

  /** Ruled-table fixture matrix (row k==84): header row + data rows with
    * currency cells + a total row — exercises V1 header detection, V2
    * typing, V4 financial/total flags, E9 grid reconstruction. */
  def tableMatrix(i: Long): Seq[Seq[String]] = {
    val r = rng(i * 13 + 5)
    val en = wordPool("en")
    val dataRows = (0 until 2 + r.nextInt(2)).map { _ =>
      Seq(en(r.nextInt(en.length)), (1 + r.nextInt(90)).toString,
        s"$$${10 + r.nextInt(900)}.${10 + r.nextInt(90)}")
    }
    val total = s"$$${100 + r.nextInt(900)}.00"
    Seq("Name", "Qty", "Price") +: dataRows :+ Seq("Total", "", total)
  }

  def pdfPayload(i: Long): Array[Byte] = {
    val k = i % 100
    if (k == 83) // scanned-style PDF: one page, no text layer, one image
      PdfWriter.build(Seq(Seq.empty), imagePages = Set(0))
    else
      PdfWriter.build(pdfLines(i), flate = k >= 85 && k <= 87, withSignature = k == 88,
        table = if (k == 84) Some(tableMatrix(i)) else None,
        // k == 82: digital text page that ALSO carries an image XObject —
        // exercises countImages on the digital_text classification path
        imagePages = if (k == 82) Set(0) else Set.empty)
  }

  // ----------------------------------------------------- expected contract

  /** Expected extracted text per url — the byte-identity contract.
    * None = no contract (corrupt-input rows assert no-crash only). */
  def expectedText(i: Long): Option[String] = i % 100 match {
    case k if k < 70 =>
      val (title, paras) = htmlContent(i)
      Some((title +: paras).mkString("\n"))
    case 83 => Some("") // scanned-style PDF: no text layer (image only)
    case 84 => // ruled-table PDF: cell runs extract after the page-1 lines
      val pages = pdfLines(i)
      val tableLines = tableMatrix(i)
        .map(_.filter(_.nonEmpty).mkString(" ")).filter(_.nonEmpty)
      val page1 = pages.head ++ tableLines
      Some((page1 +: pages.tail.map(_.toSeq))
        .map(_.mkString("\n")).mkString("\n\n--- PAGE BREAK ---\n\n"))
    case k if k < 89 =>
      Some(pdfLines(i).map(_.mkString("\n")).mkString("\n\n--- PAGE BREAK ---\n\n"))
    case 89 => None // truncated PDF
    case k if k < 92 => Some("") // empty / whitespace-only payloads
    case k if k < 95 => None // image payloads: S8-gated (status unsupported)
    case 95 => // bad entities + stray '<' in text, still a valid contract
      val (title, paras) = htmlContent(i)
      Some((title +: (paras :+ oddities)).mkString("\n"))
    case 96 => None // truncated HTML
    case 97 => // unclosed <script> after content: content unaffected
      val (title, paras) = htmlContent(i)
      Some((title +: paras).mkString("\n"))
    case 98 => // non-UTF8 bytes inside a paragraph
      val (title, paras) = htmlContent(i)
      val garbled = new String(garbledPara(i), StandardCharsets.UTF_8)
      Some((title +: (paras :+ graft.html.Boilerplate.normalizeWs(garbled))).mkString("\n"))
    case _ => // 99: mega-doc, normal contract
      val (title, paras) = htmlContent(i)
      Some((title +: paras).mkString("\n"))
  }

  private val oddities =
    "Values where 5 < 6 and x &notathing; stay as literal text tokens in this paragraph of sufficient length for the classifier rules here."

  /** REAL image payloads for the S8 format gate and the multimodal
    * feature stage (k = 92 png, 93 jpg, 94 gif): a seeded
    * gradient-plus-noise grayscale raster encoded with the JDK's
    * built-in ImageIO writers — the extraction gate still quarantines on
    * magic bytes alone, while `Multimodal.imageFeatures` decodes actual
    * pixels (round-3 shipped magic + junk bytes, which made the decode
    * stage untestable). Deterministic: pixel values are a pure function
    * of the row index and the JDK encoders are pure. */
  private def imagePayload(i: Long, k: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val r = rng(i * 23 + 11)
    val w = 24 + r.nextInt(17)
    val h = 16 + r.nextInt(17)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val grad = (x * 255 / math.max(1, w - 1) + y * 255 / math.max(1, h - 1)) / 2
        val lum = math.min(255, grad + r.nextInt(32))
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(512)
    val fmt = k match { case 92 => "png"; case 93 => "jpg"; case _ => "gif" }
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def garbledPara(i: Long): Array[Byte] = {
    val r = rng(i * 17 + 3)
    val en = wordPool("en")
    val words = (0 until 24).map(_ => en(r.nextInt(en.length))).mkString(" ")
    words.getBytes(StandardCharsets.UTF_8) ++ Array(0xFF.toByte, 0xFE.toByte) ++
      " trailing words after invalid bytes close the paragraph".getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------ row builder

  def payload(i: Long): Array[Byte] = i % 100 match {
    case k if k < 70 => htmlPayload(i).getBytes(StandardCharsets.UTF_8)
    case k if k < 89 => pdfPayload(i)
    case 89 =>
      val full = pdfPayload(i - 1) // build a valid one, then truncate
      java.util.Arrays.copyOfRange(full, 0, full.length / 3)
    case 90 => Array.emptyByteArray
    case 91 => "   \n\t  \n".getBytes(StandardCharsets.UTF_8)
    case k if k < 95 => imagePayload(i, k) // png/jpg/gif → S8 gate
    case 95 =>
      val base = htmlPayload(i)
      val extra = s"  <p>\n    ${oddities.replace("&notathing;", "&notathing;")}\n  </p>"
      base.replace("</main>", extra + "\n</main>").getBytes(StandardCharsets.UTF_8)
    case 96 =>
      val full = htmlPayload(i)
      full.substring(0, full.length / 2).getBytes(StandardCharsets.UTF_8)
    case 97 =>
      htmlPayload(i).replace("</body>", "<script>var x = unclosed;\n</body>")
        .getBytes(StandardCharsets.UTF_8)
    case 98 =>
      val base = htmlPayload(i)
      val idx = base.indexOf("</main>")
      base.substring(0, idx).getBytes(StandardCharsets.UTF_8) ++
        "  <p>".getBytes(StandardCharsets.UTF_8) ++ garbledPara(i) ++
        "</p>\n".getBytes(StandardCharsets.UTF_8) ++
        base.substring(idx).getBytes(StandardCharsets.UTF_8)
    case _ => htmlPayload(i).getBytes(StandardCharsets.UTF_8) // 99 mega-doc
  }

  def row(i: Long): CorpusRow = CorpusRow(
    url = urlOf(i),
    warc_ts = tsOf(i),
    html = payload(i),
    text = expectedText(i).orNull,
    lang = langOf(i))

  /** Distributed generation: every row is a pure function of its index. */
  def generate(spark: org.apache.spark.sql.SparkSession, n: Long,
      partitions: Int = 32): org.apache.spark.sql.Dataset[CorpusRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(row(_))
  }
}
