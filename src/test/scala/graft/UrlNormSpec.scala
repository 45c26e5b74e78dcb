package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlNorm

/** URL canonicalization (url-level dedup key): pinned RFC-3986-safe
  * transforms as pure column expressions. */
class UrlNormSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlNorm.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercase, default port stripped, path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/One") ==
      Seq("https://www.example.com/Path/One"))
    assert(canon("http://Host.Org:80/A") == Seq("http://host.org/A"))
    // non-default port survives
    assert(canon("https://h.io:8443/x") == Seq("https://h.io:8443/x"))
    // :80 is NOT default for https (and vice versa)
    assert(canon("https://h.io:80/x") == Seq("https://h.io:80/x"))
  }

  test("fragment dropped, query params sorted, empty query elided") {
    assert(canon("https://h.io/p?b=2&a=1&c=3#frag") ==
      Seq("https://h.io/p?a=1&b=2&c=3"))
    assert(canon("https://h.io/p#only-frag") == Seq("https://h.io/p"))
    assert(canon("https://h.io/p?z=1") == Seq("https://h.io/p?z=1"))
  }

  test("idempotent: canonicalizing a canonical URL is the identity") {
    val once = canon("HTTPS://A.B:443/P/q?b=2&a=1#f")
    assert(canon(once.head) == once)
  }

  test("hostOf: lowercased host, any port stripped, query/fragment ignored") {
    val hosts = Seq("HTTPS://WWW.Ex.COM:8443/p?a=1#f", "http://h.io/x", "https://A.B:443")
      .toDF("u").select(UrlNorm.hostOf(col("u")).as("h")).as[String].collect().toSeq
    assert(hosts == Seq("www.ex.com", "h.io", "a.b"))
  }

  test("stays codegen: no UDF in the plan") {
    val df = Seq("https://h.io/p?b=2&a=1").toDF("u")
      .select(UrlNorm.canonicalizeUrl(col("u")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"canonicalization must stay in codegen:\n$plan")
  }
}
