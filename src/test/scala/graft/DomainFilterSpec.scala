package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DomainFilter

/** Domain blocklist derive + apply: pinned median-of-means rule and
  * anti-join semantics for the `domain_blocklist` oracle. */
class DomainFilterSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // host means: a=100, b=200, c=300 -> median 200; strict < blocks only a
  private val docs = Seq(
    (1L, "a.com", 80L), (2L, "a.com", 120L),
    (3L, "b.com", 200L),
    (4L, "c.com", 250L), (5L, "c.com", 350L)
  ).toDF("doc_id", "host", "q")

  test("hostStats computes exact counts, sums, and means") {
    val stats = DomainFilter.hostStats(docs, "host", "q")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stats == Map(
      "a.com" -> ((2L, 200L, 100.0)),
      "b.com" -> ((1L, 200L, 200.0)),
      "c.com" -> ((2L, 600L, 300.0))))
  }

  test("blocklist is strictly-below-median; the median host survives") {
    val blocked = DomainFilter.deriveBlocklist(
        DomainFilter.hostStats(docs, "host", "q"))
      .as[String].collect().toSet
    assert(blocked == Set("a.com"))
  }

  test("applyBlocklist drops exactly the blocked hosts' docs") {
    val stats = DomainFilter.hostStats(docs, "host", "q")
    val kept = DomainFilter.applyBlocklist(
        docs, DomainFilter.deriveBlocklist(stats), "host")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("uniform corpus blocks nothing (no mean is below the median)") {
    val flat = Seq((1L, "x.com", 10L), (2L, "y.com", 10L), (3L, "z.com", 10L))
      .toDF("doc_id", "host", "q")
    val blocked = DomainFilter.deriveBlocklist(
      DomainFilter.hostStats(flat, "host", "q")).count()
    assert(blocked == 0L)
  }
}
