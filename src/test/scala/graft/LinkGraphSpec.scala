package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LinkGraph

/** Host link graph + integer PageRank: pinned hand-computed ranks and
  * graph-derivation semantics for the `host_pagerank` oracle. */
class LinkGraphSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // a -> {b, c}, b -> a; c dangles. deg(a)=2, deg(b)=1.
  private val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"))
    .toDF("src", "dst")

  private def ranks(iters: Int): Map[String, Long] =
    LinkGraph.pageRankMicro(edges, iters)
      .as[(String, Long)].collect().toMap

  test("one iteration matches the hand computation") {
    // contribs: a sends 1000000 div 2 = 500000 to b and c; b sends
    // 1000000 to a. rank = 150000 + (85 * s) div 100.
    assert(ranks(1) == Map(
      "a" -> 1000000L, "b" -> 575000L, "c" -> 575000L))
  }

  test("two iterations: dangling c's mass drops, not redistributes") {
    // round 2 contribs: a sends 500000 to b and c; b sends 575000 to a;
    // c contributes nothing (dangling).
    assert(ranks(2) == Map(
      "a" -> 638750L, "b" -> 575000L, "c" -> 575000L))
  }

  test("hostEdges dedupes repeated links and drops self-loops") {
    val docs = Seq(
      (1L, "a.com", Seq("b.com", "b.com", "a.com")),
      (2L, "a.com", Seq("b.com", "c.com")),
      (3L, "b.com", Seq("b.com"))
    ).toDF("doc_id", "host", "out_hosts")
    val e = LinkGraph.hostEdges(docs, "host", "out_hosts")
      .as[(String, String)].collect().toSet
    assert(e == Set("a.com" -> "b.com", "a.com" -> "c.com"))
  }

  test("ranks are partitioning-invariant (pure integer arithmetic)") {
    val shuffled = edges.repartition(7)
    val r = LinkGraph.pageRankMicro(shuffled, 3)
      .as[(String, Long)].collect().toMap
    val r1 = LinkGraph.pageRankMicro(edges.coalesce(1), 3)
      .as[(String, Long)].collect().toMap
    assert(r == r1)
  }

  test("a host with no in-links sits at the damping base") {
    // b -> a only: b has no in-links, every iteration leaves it at base.
    val e = Seq(("b", "a")).toDF("src", "dst")
    val r = LinkGraph.pageRankMicro(e, 3).as[(String, Long)].collect().toMap
    assert(r("b") == 150000L)
    assert(r("a") > r("b"))
  }
}
