package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Warc

/** WARC 1.1 framing, HTTP split, gzip members — pinned semantics for
  * the `warc_extract` oracle. */
class WarcSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private def httpResponse(status: String, headers: String,
                           body: String): Array[Byte] =
    utf8(s"HTTP/1.1 $status\r\n$headers\r\n\r\n$body")

  test("Content-Length framing survives WARC/ and blank lines in bodies") {
    val trap = "first\r\n\r\nWARC/1.1 not a record\r\nContent-Length: 0"
    val blob =
      Warc.writeRecord("warcinfo",
        Seq("WARC-Date" -> "2026-01-01T00:00:00Z"), utf8("software: graft")) ++
      Warc.writeRecord("response",
        Seq("WARC-Target-URI" -> "http://a.example/x",
            "WARC-Date" -> "2026-01-02T03:04:05Z"),
        httpResponse("200 OK", "Content-Type: text/html; charset=UTF-8",
          trap)) ++
      Warc.writeRecord("request",
        Seq("WARC-Target-URI" -> "http://a.example/x"),
        utf8("GET /x HTTP/1.1"))
    val recs = Warc.parseAll(blob)
    assert(recs.map(_.warcType) == List("warcinfo", "response", "request"))
    val http = Warc.parseHttp(recs(1).body)
    assert(http.status == 200)
    assert(new String(http.body, StandardCharsets.UTF_8) == trap,
      "the body must come back byte-exact, traps included")
  }

  test("per-record gzip members inflate transparently") {
    val r1 = Warc.writeRecord("response",
      Seq("WARC-Target-URI" -> "http://g.example/1"),
      httpResponse("200 OK", "Content-Type: text/plain", "one"))
    val r2 = Warc.writeRecord("response",
      Seq("WARC-Target-URI" -> "http://g.example/2"),
      httpResponse("404 Not Found", "Content-Type: text/plain", "two"))
    val blob = Warc.gzipMember(r1) ++ Warc.gzipMember(r2)
    val recs = Warc.parseAll(blob)
    assert(recs.map(_.headers("warc-target-uri")) ==
      List("http://g.example/1", "http://g.example/2"))
    assert(Warc.parseHttp(recs(1).body).status == 404)
  }

  test("named fields: case-insensitive keys, continuation folding") {
    val raw = "WARC/1.1\r\nwArC-tYpE: response\r\n" +
      "WARC-Target-URI: http://f.example/\r\n\tcontinued\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n"
    val recs = Warc.parseAll(utf8(raw))
    assert(recs.head.warcType == "response")
    assert(recs.head.headers("warc-target-uri") ==
      "http://f.example/ continued")
  }

  test("truncated tail ends the parse instead of throwing") {
    val good = Warc.writeRecord("response",
      Seq("WARC-Target-URI" -> "http://t.example/"),
      httpResponse("200 OK", "Content-Type: text/html", "ok"))
    val truncated = good ++ utf8("WARC/1.1\r\nContent-Length: 999\r\n\r\nx")
    assert(Warc.parseAll(truncated).length == 1)
    assert(Warc.parseAll(utf8("garbage")).isEmpty)
  }

  test("content-type split: media type + charset parameter") {
    assert(Warc.splitContentType("text/HTML; charset=UTF-8") ==
      ("text/html", "utf-8"))
    assert(Warc.splitContentType("text/plain") == ("text/plain", ""))
    assert(Warc.splitContentType(
      "application/json; profile=x; CHARSET=\"iso-8859-1\"") ==
      ("application/json", "iso-8859-1"))
    assert(Warc.splitContentType("") == ("", ""))
  }

  test("responses: one typed flatMap emits only response records") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val blob =
      Warc.writeRecord("warcinfo", Nil, utf8("software: graft")) ++
      Warc.writeRecord("response",
        Seq("WARC-Target-URI" -> "http://d.example/p",
            "WARC-Date" -> "2026-02-03T00:00:00Z"),
        httpResponse("301 Moved", "Content-Type: text/html; charset=utf-8",
          "<html>moved</html>"))
    val df = Seq(Tuple1(Warc.gzipMember(blob))).toDF("blob")
    val rows = Warc.responses(df, "blob")
      .as[(String, String, Int, String, String, String)].collect().toList
    assert(rows == List(("http://d.example/p", "2026-02-03T00:00:00Z",
      301, "text/html", "utf-8", "<html>moved</html>")))
  }
}
