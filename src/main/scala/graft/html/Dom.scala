package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal DOM tree built from the token stream (SURVEY.md E10).
  * Error-tolerant: unmatched end tags are dropped, unclosed elements are
  * implicitly closed, HTML "implied end tag" rules are applied for the
  * common cases (p, li, td/th/tr, dt/dd, option). */
sealed trait Node
final case class TextNode(text: String) extends Node
final case class Element(tag: String, attrs: Map[String, String], children: Vector[Node]) extends Node {
  def attr(name: String): String = attrs.getOrElse(name, "")
}

object DomBuilder {

  /** Maximum open-element depth; deeper markup is flattened (browsers
    * apply similar caps — Blink uses 512). */
  val MaxDepth = 256

  /** Void elements never have children. */
  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Opening one of these implicitly closes an open <p>. */
  private val closesP = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "table", "ul")

  private final class OpenEl(val tag: String, val attrs: Map[String, String]) {
    val children = new ArrayBuffer[Node](4)
    def toElement: Element = Element(tag, attrs, children.toVector)
  }

  def parse(html: String): Element = build(HtmlTokenizer.tokenize(html))

  def build(tokens: scala.collection.Seq[HtmlTokenizer.Token]): Element = {
    import HtmlTokenizer._
    val stack = new ArrayBuffer[OpenEl](16)
    stack += new OpenEl("#root", Map.empty)

    def top: OpenEl = stack(stack.length - 1)

    def closeTo(idx: Int): Unit = {
      // pop and attach elements down to (and including) idx
      while (stack.length - 1 >= idx && stack.length > 1) {
        val el = stack.remove(stack.length - 1)
        stack(stack.length - 1).children += el.toElement
      }
    }

    // any stack element strictly above idx satisfying p? (index loop —
    // the previous stack.slice(...).exists allocated a buffer copy per
    // implied-end-tag check, i.e. per block-level open tag)
    def existsAbove(idx: Int)(p: OpenEl => Boolean): Boolean = {
      var i = idx + 1
      while (i < stack.length) { if (p(stack(i))) return true; i += 1 }
      false
    }

    def impliedEndTags(incoming: String): Unit = {
      // close <p> when a block-level element opens
      if (closesP(incoming)) {
        val pIdx = lastIndexOf("p")
        if (pIdx > 0 && !existsAbove(pIdx)(e => closesP(e.tag) && e.tag != "p"))
          closeTo(pIdx)
      }
      incoming match {
        case "li" =>
          val idx = lastIndexOf("li")
          if (idx > 0 && !existsAbove(idx)(e => e.tag == "ul" || e.tag == "ol")) closeTo(idx)
        case "dt" | "dd" =>
          val idx = math.max(lastIndexOf("dt"), lastIndexOf("dd"))
          if (idx > 0) closeTo(idx)
        case "tr" =>
          val idx = lastIndexOf("tr")
          if (idx > 0 && !existsAbove(idx)(_.tag == "table")) closeTo(idx)
        case "td" | "th" =>
          val idx = math.max(lastIndexOf("td"), lastIndexOf("th"))
          if (idx > 0 && !existsAbove(idx)(e => e.tag == "tr" || e.tag == "table")) closeTo(idx)
        case "option" =>
          val idx = lastIndexOf("option")
          if (idx > 0) closeTo(idx)
        case _ =>
      }
    }

    def lastIndexOf(tag: String): Int = {
      var i = stack.length - 1
      while (i >= 0 && stack(i).tag != tag) i -= 1
      i
    }

    tokens.foreach {
      case StartTag(name, attrs, selfClosing) =>
        impliedEndTags(name)
        if (voidTags(name) || selfClosing || stack.length >= MaxDepth) {
          // depth cap: a page nesting thousands of open tags flattens
          // past MaxDepth instead of building a tree whose traversal
          // would overflow the stack downstream (never-throws contract)
          top.children += Element(name, attrs.toMap, Vector.empty)
        } else {
          stack += new OpenEl(name, attrs.toMap)
        }
      case EndTag(name) =>
        val idx = lastIndexOf(name)
        if (idx > 0) closeTo(idx)
      // else: unmatched end tag — ignore
      case Text(value) =>
        if (value.nonEmpty) top.children += TextNode(value)
      case Comment(_) | Doctype(_) => // dropped
    }
    closeTo(1)
    stack(0).toElement
  }
}
