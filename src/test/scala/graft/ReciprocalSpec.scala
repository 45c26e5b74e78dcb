package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LinkGraph

/** Link-reciprocity semantics pinned for the `reciprocal_links`
  * oracle. */
class ReciprocalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def stats(edges: Seq[(String, String)]) = {
    import spark.implicits._
    LinkGraph.reciprocalStats(edges.toDF("src", "dst"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("clique is fully reciprocal; chain is not; ratio is integer div") {
    val got = stats(Seq(
      ("a", "b"), ("b", "a"),          // mutual pair
      ("a", "c"), ("c", "a"),          // mutual pair
      ("a", "d"),                      // one-way
      ("d", "e")))                     // one-way
    assert(got("a") == ((3L, 2L, 666666L)), "2 of 3 -> 666666 micro")
    assert(got("b") == ((1L, 1L, 1000000L)))
    assert(got("c") == ((1L, 1L, 1000000L)))
    assert(got("d") == ((1L, 0L, 0L)))
  }

  test("hosts with only in-links don't appear (out_deg 0 undefined)") {
    val got = stats(Seq(("a", "b")))
    assert(got.keySet == Set("a"))
  }

  test("partitioning invariance") {
    import spark.implicits._
    val edges = (0 until 50).flatMap(i =>
      Seq((s"h$i", s"h${(i + 1) % 50}"), (s"h${(i + 1) % 50}", s"h$i")))
    val df = edges.toDF("src", "dst")
    val a = LinkGraph.reciprocalStats(df).collect()
      .map(_.toString).sorted.toSeq
    val b = LinkGraph.reciprocalStats(df.repartition(11)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
