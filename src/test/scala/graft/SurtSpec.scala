package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.UrlNorm

/** SURT-key semantics pinned for the `surt_keys` oracle. */
class SurtSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def surt(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("url").select(UrlNorm.surtKey(col("url")).as("s"))
      .as[String].collect().head
  }

  test("full gauntlet: case, www, default port, query sort, fragment") {
    assert(surt("HTTPS://WWW.Example.COM:443/Path/Page?b=2&a=1#frag") ==
      "com,example)/path/page?a=1&b=2")
  }

  test("deep host reverses label by label; www only strips at front") {
    assert(surt("http://sub.blog.example.org/post/7") ==
      "org,example,blog,sub)/post/7")
    assert(surt("http://notwww.example.com/") == "com,example,notwww)/")
  }

  test("non-default port survives after the host") {
    assert(surt("http://example.net:8080/?z=1&y=2") ==
      "net,example:8080)/?y=2&z=1")
  }

  test("no percent-decoding; hex case lowers with the path") {
    assert(surt("http://www.example.com/a%2Fb?x=%4A") ==
      "com,example)/a%2fb?x=%4a")
  }

  test("bare host gets the root path; empty query drops its ?") {
    assert(surt("https://Example.com") == "com,example)/")
    assert(surt("http://example.com/x?") == "com,example)/x")
  }

  test("site sections sort contiguously (the point of SURT)") {
    val keys = Seq(
      "http://a.example.com/1", "http://example.com/2",
      "http://b.other.net/3", "http://example.com/1")
      .map(surt).sorted
    assert(keys == Seq("com,example)/1", "com,example)/2",
      "com,example,a)/1", "net,other,b)/3"))
  }
}
