package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML `<table>` → raw cell matrix. Rows are `<tr>` anywhere under the
  * table (thead/tbody/tfoot transparent); cells are direct `<td>`/`<th>`
  * children of a row; cell text is the whitespace-normalized
  * concatenation of descendant text. colspan repeats the value into the
  * spanned slots so the matrix stays rectangular (the reference's
  * PyMuPDF path also yields a plain rectangular matrix, which the
  * enhancement layer V1–V6 then types). Nested tables contribute to the
  * inner table only. */
object HtmlTables {

  def extract(root: Element): Vector[Vector[Vector[String]]] = {
    val tables = new ArrayBuffer[Vector[Vector[String]]]
    def walk(e: Element): Unit = {
      if (e.tag == "table") tables += matrixOf(e)
      e.children.foreach { case c: Element => walk(c); case _ => }
    }
    walk(root)
    tables.toVector
  }

  private def matrixOf(table: Element): Vector[Vector[String]] = {
    val rows = new ArrayBuffer[Vector[String]]
    def findRows(e: Element): Unit = e.children.foreach {
      case el: Element if el.tag == "tr" => rows += cellsOf(el)
      case el: Element if el.tag == "table" => // nested table: skip here
      case el: Element => findRows(el)
      case _ =>
    }
    findRows(table)
    rows.toVector
  }

  private def cellsOf(tr: Element): Vector[String] = {
    val out = new ArrayBuffer[String]
    tr.children.foreach {
      case el: Element if el.tag == "td" || el.tag == "th" =>
        val text = Boilerplate.normalizeWs(textOf(el))
        // clamp both ways: colspan="2000000000" must not OOM the task
        val span = el.attr("colspan").toIntOption.getOrElse(1)
          .max(1).min(512)
        (0 until span).foreach(_ => out += text)
      case _ =>
    }
    out.toVector
  }

  private def textOf(n: Node): String = n match {
    case TextNode(t) => t
    case Element("table", _, _) => "" // nested table text stays out
    case Element(_, _, children) => children.map(textOf).mkString(" ")
  }
}
