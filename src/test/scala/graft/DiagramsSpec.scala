package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Diagrams._

/** V7 diagram/chart reconstruction serializers — golden strings below
  * were produced by executing the reference's own DetectedDiagram /
  * DetectedChart serializers (`visual_extractor.py:249-571`) on the same
  * structures (byte parity; json.dumps spacing for Plotly). */
class DiagramsSpec extends AnyFunSuite {

  test("flowchart mermaid: shapes, sanitized ids, edge styles, title block") {
    val d = Diagram("d1", diagramType = "flowchart", title = Some("Flow"),
      nodes = Seq(
        DiagramNode("start", "Start Here", "circle"),
        DiagramNode("q?", "Is \"ok\"?", "diamond"),
        DiagramNode("end", "Done", "rounded")),
      edges = Seq(
        DiagramEdge("start", "q?", label = Some("go")),
        DiagramEdge("q?", "end", style = "dotted"),
        DiagramEdge("end", "start", arrow = "bidirectional")))
    val golden = Seq(
      "---", "title: Flow", "---", "flowchart TD",
      "    start((\"Start Here\"))",
      "    q_{\"Is \\\"ok\\\"?\"}",
      "    end(\"Done\")",
      "    start -->|\"go\"| q_",
      "    q_ -.-> end",
      "    end <--> start").mkString("\n")
    assert(d.toMermaid == golden)
  }

  test("bar chart: plotly json, csv with ragged series, byte parity") {
    val c = Chart("c1", chartType = "bar", title = Some("Revenue"),
      xAxisLabel = Some("Quarter"), yAxisLabel = Some("MM"),
      labels = Seq("Q1", "Q2, etc", "Q3"),
      dataSeries = Seq(
        ChartSeries("2025", Seq(1.5, 2.0, 3.25)),
        ChartSeries("2026", Seq(2.5, 4.0))))
    assert(c.toPlotlyJson ==
      """{"data": [{"type": "bar", "x": ["Q1", "Q2, etc", "Q3"], "y": [1.5, 2.0, 3.25], "name": "2025"}, """ +
      """{"type": "bar", "x": ["Q1", "Q2, etc", "Q3"], "y": [2.5, 4.0], "name": "2026"}], """ +
      """"layout": {"title": {"text": "Revenue"}, "xaxis": {"title": {"text": "Quarter"}}, "yaxis": {"title": {"text": "MM"}}}}""")
    assert(c.toCsvData ==
      "Label,2025,2026\r\nQ1,1.5,2.5\r\n\"Q2, etc\",2.0,4.0\r\nQ3,3.25,\r\n")
    assert(c.toMermaidPie.isEmpty)
  }

  test("pie chart: mermaid pie and plotly pie trace") {
    val p = Chart("p1", chartType = "pie", title = Some("Share"),
      labels = Seq("a", "b"), dataSeries = Seq(ChartSeries("s", Seq(60.0, 40.0))))
    assert(p.toMermaidPie.contains(
      "pie showData\n    title Share\n    \"a\" : 60.0\n    \"b\" : 40.0"))
    assert(p.toPlotlyJson ==
      """{"data": [{"type": "pie", "labels": ["a", "b"], "values": [60.0, 40.0], "name": "s"}], """ +
      """"layout": {"title": {"text": "Share"}, "xaxis": {}, "yaxis": {}}}""")
  }

  test("untitled diagram has no front-matter block; unknown type defaults to flowchart") {
    val d = Diagram("d2", diagramType = "weird",
      edges = Seq(DiagramEdge("a b", "c-d")))
    assert(d.toMermaid == "flowchart TD\n    a_b --> c_d")
  }
}
