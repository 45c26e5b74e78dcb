package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML `<table>` → raw cell matrix. Rows are `<tr>` anywhere under the
  * table (thead/tbody/tfoot transparent); cells are direct `<td>`/`<th>`
  * children of a row; cell text is the whitespace-normalized
  * concatenation of descendant text. colspan repeats the value into the
  * spanned slots and rowspan carries the value down into the spanned
  * rows, so the matrix stays rectangular (the reference's PyMuPDF path
  * also yields a plain rectangular matrix, which the enhancement layer
  * V1–V6 then types). Nested tables contribute to the inner table only. */
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
    val trs = new ArrayBuffer[Element]
    def findRows(e: Element): Unit = e.children.foreach {
      case el: Element if el.tag == "tr" => trs += el
      case el: Element if el.tag == "table" => // nested table: skip here
      case el: Element => findRows(el)
      case _ =>
    }
    findRows(table)

    // rowspan carry-down: col index -> (rows still spanned, text). Each
    // carried col injects its text where the grid says it sits; entries
    // age by one row per <tr> whether or not the row reached that col.
    var pending = Map.empty[Int, (Int, String)]
    val out = new ArrayBuffer[Vector[String]]
    trs.foreach { tr =>
      val row = new ArrayBuffer[String]
      val added = scala.collection.mutable.Map.empty[Int, (Int, String)]
      var colIdx = 0
      def absorbPending(): Unit =
        while (pending.contains(colIdx)) { row += pending(colIdx)._2; colIdx += 1 }
      tr.children.foreach {
        case el: Element if el.tag == "td" || el.tag == "th" =>
          absorbPending()
          val text = Boilerplate.normalizeWs(textOf(el))
          // clamp both ways: colspan="2000000000" must not OOM the task
          val cspan = el.attr("colspan").toIntOption.getOrElse(1).max(1).min(512)
          val rspan = el.attr("rowspan").toIntOption.getOrElse(1).max(1).min(512)
          (0 until cspan).foreach { _ =>
            if (rspan > 1) added(colIdx) = (rspan - 1, text)
            row += text
            colIdx += 1
          }
        case _ =>
      }
      absorbPending()
      out += row.toVector
      pending = pending.flatMap { case (c, (left, t)) =>
        if (left - 1 <= 0) None else Some(c -> (left - 1, t))
      } ++ added
    }
    out.toVector
  }

  private def textOf(n: Node): String = n match {
    case TextNode(t) => t
    case Element("table", _, _) => "" // nested table text stays out
    case Element(_, _, children) => children.map(textOf).mkString(" ")
  }
}
