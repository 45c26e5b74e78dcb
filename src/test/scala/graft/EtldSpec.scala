package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.Etld

/** Registrable-domain semantics pinned for the `registrable_domains`
  * oracle. */
class EtldSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def reg(host: String): String = {
    import spark.implicits._
    Seq(host).toDF("host")
      .select(Etld.registrableDomain(col("host")).as("r"))
      .as[String].collect().head
  }

  test("two-label public suffix takes three labels") {
    assert(reg("a.example.co.uk") == "example.co.uk")
    assert(reg("x.y.z.example.com.au") == "example.com.au")
  }

  test("ordinary TLD takes two labels regardless of subdomain depth") {
    assert(reg("www.example.com") == "example.com")
    assert(reg("deep.sub.example.net") == "example.net")
    assert(reg("example.org") == "example.org")
  }

  test("single-label hosts pass through; a bare suffix stays itself") {
    assert(reg("localhost") == "localhost")
    assert(reg("co.uk") == "co.uk",
      "pinned: a bare two-label suffix has no +1 label to take")
  }
}
