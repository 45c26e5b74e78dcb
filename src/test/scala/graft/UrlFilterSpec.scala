package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlFilter

/** Crawl-frontier URL rules: pinned reasons and precedence for the
  * `url_rules` oracle. */
class UrlFilterSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def reason(url: String): Option[String] =
    UrlFilter.withUrlRules(Seq((1L, url)).toDF("doc_id", "url"), "url")
      .select("url_drop_reason").as[Option[String]].head()

  test("clean urls keep") {
    assert(reason("https://www.example.com/a/b?x=1") == None)
    assert(reason("http://example.org/") == None)
  }

  test("non-http schemes drop as scheme") {
    assert(reason("ftp://example.com/f") == Some("scheme"))
    assert(reason("javascript:alert(1)") == Some("scheme"))
  }

  test("overlong urls drop as too_long") {
    assert(reason("https://e.com/" + "z" * 2100) == Some("too_long"))
  }

  test("deep paths drop as too_deep") {
    assert(reason("https://e.com" + "/p" * 9) == Some("too_deep"))
    assert(reason("https://e.com" + "/p" * 8) == None)
  }

  test("parameter floods drop as too_many_params") {
    val q = (1 to 9).map(i => s"k$i=$i").mkString("&")
    assert(reason(s"https://e.com/p?$q") == Some("too_many_params"))
  }

  test("crawler traps drop as trap_pattern") {
    assert(reason("https://e.com/tag/spark") == Some("trap_pattern"))
    assert(reason("https://e.com/x?sessionid=abc") == Some("trap_pattern"))
    assert(reason("https://e.com/calendar/2026/08") == Some("trap_pattern"))
  }

  test("precedence: scheme beats trap; depth beats trap") {
    assert(reason("ftp://e.com/tag/x") == Some("scheme"))
    assert(reason("https://e.com" + "/p" * 9 + "/tag/x") ==
      Some("too_deep"))
  }
}
