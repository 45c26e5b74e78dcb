package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HostCap

/** Per-host document caps (domain rate limiting): pinned top-k-per-host
  * semantics for the `host_cap` oracle. */
class HostCapSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a.com", 100L), (2L, "a.com", 300L), (3L, "a.com", 200L),
    (4L, "a.com", 300L),   // ties with doc 2 on quality; doc_id breaks it
    (5L, "b.com", 50L)
  ).toDF("doc_id", "host", "q")

  test("keeps exactly k best-ranked docs per host, in order") {
    val out = HostCap.capPerHost(docs, "host", 2,
        col("q").desc, col("doc_id").asc)
      .select("doc_id", "host", "host_rank")
      .as[(Long, String, Int)].collect().toSet
    // a.com: q=300 twice -> docs 2 then 4; b.com keeps its single doc
    assert(out == Set((2L, "a.com", 1), (4L, "a.com", 2), (5L, "b.com", 1)))
  }

  test("hosts under the cap keep everything; rank is 1-based contiguous") {
    val out = HostCap.capPerHost(docs, "host", 10,
        col("q").desc, col("doc_id").asc)
      .groupBy("host").agg(count(lit(1)).as("n"), max("host_rank").as("mx"))
      .as[(String, Long, Int)].collect()
      .map { case (h, n, m) => h -> ((n, m)) }.toMap
    assert(out == Map("a.com" -> ((4L, 4)), "b.com" -> ((1L, 1))))
  }

  test("cap decision is stable across partitionings (total order)") {
    val a = HostCap.capPerHost(docs, "host", 2, col("q").desc, col("doc_id").asc)
      .select("doc_id").as[Long].collect().toSet
    val b = HostCap.capPerHost(docs.repartition(7), "host", 2,
        col("q").desc, col("doc_id").asc)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
