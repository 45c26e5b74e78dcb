package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rendezvous

/** HRW assignment semantics pinned for the `rendezvous_assign`
  * oracle. */
class RendezvousSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val workers = (0 until 8).map(i => s"f$i")

  private def assign(keys: Seq[String],
                     ws: Seq[String]): Map[String, String] = {
    import spark.implicits._
    Rendezvous.assign(keys.toDF("host"), "host", ws)
      .as[(String, String)].collect().toMap
  }

  test("column expression matches the reference hash argmax") {
    val keys = (0 until 40).map(i => s"h$i")
    val got = assign(keys, workers)
    val exp = keys.map { k =>
      k -> workers.maxBy(w => (Rendezvous.weight31(s"$w|$k"), w))
    }.toMap
    assert(got == exp)
  }

  test("minimal disruption: removing one worker only moves its keys") {
    val keys = (0 until 60).map(i => s"host$i.example")
    val before = assign(keys, workers)
    val gone = before.values.toSeq
      .groupBy(identity).maxBy(_._2.size)._1 // busiest worker leaves
    val after = assign(keys, workers.filterNot(_ == gone))
    keys.foreach { k =>
      if (before(k) != gone)
        assert(after(k) == before(k),
          s"$k moved from ${before(k)} despite its worker staying")
    }
    assert(keys.exists(k => before(k) == gone), "fixture hit the worker")
  }

  test("all workers get load on a spread keyspace") {
    val got = assign((0 until 400).map(i => s"k$i"), workers)
    assert(got.values.toSet == workers.toSet)
  }

  test("deterministic across partitioning") {
    import spark.implicits._
    val keys = (0 until 100).map(i => s"h$i")
    val a = Rendezvous.assign(keys.toDF("host"), "host", workers)
      .collect().map(_.toString).sorted.toSeq
    val b = Rendezvous.assign(keys.toDF("host").repartition(9), "host",
        workers)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
