package graft.tables

/** Diagram / chart reconstruction serializers (SURVEY.md §2.5 V7) —
  * semantics of `idp_pipeline/models/visual_extractor.py:249-571`:
  * Mermaid node/edge/flowchart forms, Plotly-shaped JSON, chart CSV,
  * Mermaid pie. In the reference the *detection* side is an AI stub that
  * always returns None (`:889-898`, `:965-974`), so these serializers are
  * reachable only through the API; they are ported so a caller that
  * constructs diagrams/charts programmatically (or a future detector)
  * gets identical reconstruction output. */
object Diagrams {

  // ------------------------------------------------------------- diagrams

  final case class DiagramNode(id: String, label: String,
      shape: String = "rectangle") {
    /** `DiagramNode.to_mermaid_node` (visual_extractor.py:258-272). */
    def toMermaidNode: String = {
      val safeId = id.replaceAll("[^a-zA-Z0-9_]", "_")
      val safeLabel = label.replace("\"", "\\\"")
      shape match {
        case "rounded" => s"""$safeId("$safeLabel")"""
        case "circle" => s"""$safeId(("$safeLabel"))"""
        case "diamond" => s"""$safeId{"$safeLabel"}"""
        case "hexagon" => s"""$safeId{{"$safeLabel"}}"""
        case "parallelogram" => s"""$safeId[/"$safeLabel"/]"""
        case "database" => s"""$safeId[("$safeLabel")]"""
        case _ => s"""$safeId["$safeLabel"]"""
      }
    }
  }

  final case class DiagramEdge(source: String, target: String,
      label: Option[String] = None, style: String = "solid",
      arrow: String = "normal") {
    /** `DiagramEdge.to_mermaid_edge` (:283-303): note the reference keys
      * the arrow map on `style` when style != "solid", else on `arrow`. */
    def toMermaidEdge: String = {
      val s = source.replaceAll("[^a-zA-Z0-9_]", "_")
      val t = target.replaceAll("[^a-zA-Z0-9_]", "_")
      val key = if (style != "solid") style else arrow
      val arrowSyntax = key match {
        case "none" => "---"
        case "bidirectional" => "<-->"
        case "dotted" => "-.->"
        case "thick" => "==>"
        case _ => "-->"
      }
      label match {
        case Some(l) => s"""$s $arrowSyntax|"${l.replace("\"", "\\\"")}"| $t"""
        case None => s"$s $arrowSyntax $t"
      }
    }
  }

  final case class Diagram(diagramId: String, page: Int = 1,
      diagramType: String = "flowchart", confidence: Double = 0.7,
      nodes: Seq[DiagramNode] = Nil, edges: Seq[DiagramEdge] = Nil,
      title: Option[String] = None) {

    /** `DetectedDiagram.to_mermaid` (:330-371). */
    def toMermaid: String = {
      val header = diagramType match {
        case "flowchart" => "flowchart TD"
        case "sequence" => "sequenceDiagram"
        case "class" => "classDiagram"
        case "state" => "stateDiagram-v2"
        case "erDiagram" => "erDiagram"
        case "pie" => "pie showData"
        case "gantt" => "gantt"
        case "mindmap" => "mindmap"
        case _ => "flowchart TD"
      }
      val lines = scala.collection.mutable.ArrayBuffer(header)
      title.foreach { t =>
        // reference inserts in reverse at index 0: ---, title: t, ---
        lines.insert(0, "---"); lines.insert(0, s"title: $t"); lines.insert(0, "---")
      }
      if (diagramType == "flowchart" || diagramType == "state")
        nodes.foreach(nd => lines += s"    ${nd.toMermaidNode}")
      edges.foreach(e => lines += s"    ${e.toMermaidEdge}")
      lines.mkString("\n")
    }
  }

  // --------------------------------------------------------------- charts

  final case class ChartSeries(name: String, values: Seq[Double])

  final case class Chart(chartId: String, page: Int = 1,
      chartType: String = "bar", confidence: Double = 0.7,
      title: Option[String] = None,
      xAxisLabel: Option[String] = None, yAxisLabel: Option[String] = None,
      labels: Seq[String] = Nil, dataSeries: Seq[ChartSeries] = Nil) {

    private def js(s: String): String = graft.analyzers.PyJson.jsString(s)
    private def jnum(d: Double): String = graft.analyzers.PyJson.floatRepr(d)
    private def jarr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")

    /** `DetectedChart.to_plotly_json` (:471-506) as a JSON string with
      * the reference's key order. */
    def toPlotlyJson: String = {
      val traces: Seq[String] = chartType match {
        case "pie" =>
          val vals = dataSeries.headOption.map(_.values).getOrElse(Nil)
          val name = dataSeries.headOption.map(_.name).getOrElse("Series 1")
          Seq(s"""{"type": "pie", "labels": ${jarr(labels.map(js))}, """ +
            s""""values": ${jarr(vals.map(jnum))}, "name": ${js(name)}}""")
        case "line" | "area" =>
          dataSeries.map { s =>
            val mode = if (chartType == "line") "lines" else "lines+markers"
            val fill = if (chartType == "area") "\"tozeroy\"" else "null"
            s"""{"type": "scatter", "mode": ${js(mode)}, "fill": $fill, """ +
            s""""x": ${jarr(labels.map(js))}, "y": ${jarr(s.values.map(jnum))}, "name": ${js(s.name)}}"""
          }
        case _ =>
          dataSeries.map { s =>
            s"""{"type": "bar", "x": ${jarr(labels.map(js))}, """ +
            s""""y": ${jarr(s.values.map(jnum))}, "name": ${js(s.name)}}"""
          }
      }
      val titleJson = title.map(t => s"""{"text": ${js(t)}}""").getOrElse("null")
      val xJson = xAxisLabel.map(l => s"""{"title": {"text": ${js(l)}}}""").getOrElse("{}")
      val yJson = yAxisLabel.map(l => s"""{"title": {"text": ${js(l)}}}""").getOrElse("{}")
      s"""{"data": ${traces.mkString("[", ", ", "]")}, """ +
      s""""layout": {"title": $titleJson, "xaxis": $xJson, "yaxis": $yJson}}"""
    }

    /** `to_csv_data` (:508-527): Python csv.writer, QUOTE_MINIMAL, CRLF;
      * missing values render as empty fields; floats via repr. */
    def toCsvData: String = {
      def field(s: String): String =
        if (s.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
          "\"" + s.replace("\"", "\"\"") + "\"" else s
      def num(d: Double): String = graft.analyzers.PyJson.floatRepr(d)
      val sb = new java.lang.StringBuilder
      sb.append(("Label" +: dataSeries.map(_.name)).map(field).mkString(",")).append("\r\n")
      labels.zipWithIndex.foreach { case (label, i) =>
        val row = label +: dataSeries.map(s =>
          if (i < s.values.length) num(s.values(i)) else "")
        sb.append(row.map(field).mkString(",")).append("\r\n")
      }
      sb.toString
    }

    /** `to_mermaid_pie` (:529-545): None unless a pie chart. */
    def toMermaidPie: Option[String] = {
      if (chartType != "pie") return None
      val lines = scala.collection.mutable.ArrayBuffer("pie showData")
      title.foreach(t => lines += s"    title $t")
      dataSeries.headOption.foreach { s =>
        labels.zipWithIndex.foreach { case (label, i) =>
          if (i < s.values.length) {
            val v = s.values(i)
            val vs = graft.analyzers.PyJson.floatRepr(v)
            lines += s"""    "$label" : $vs"""
          }
        }
      }
      Some(lines.mkString("\n"))
    }
  }
}
