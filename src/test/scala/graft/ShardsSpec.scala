package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Shards

/** Two-level prefix-sum shard assignment pinned for the `shard_assign`
  * oracle. */
class ShardsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("matches the single-window reference cumsum exactly") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, 50L + i % 400)).toDF("id", "b")
    val got = Shards.assign(docs, "id", "b", targetBytes = 10000L,
        bucketSize = 64L)
      .select("id", "start_off", "shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    (0L until 500L).foreach { i =>
      val bytes = 50L + i % 400
      val (_, off, shard) = got(i.toInt)
      assert(off == cum, s"start offset wrong at id $i")
      assert(shard == cum / 10000L)
      cum += bytes
    }
  }

  test("every shard stays under target + max doc size; ids contiguous") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, 100L + (i * 37) % 900))
      .toDF("id", "b")
    val stats = Shards.shardStats(
        Shards.assign(docs, "id", "b", 20000L, 128L), "id")
      .as[(Long, Long, Long, Long, Long)].collect()
    stats.foreach { case (shard, _, bytes, _, _) =>
      assert(bytes < 20000L + 1000L, s"shard $shard overflows: $bytes")
    }
    // shards cover contiguous, non-overlapping id ranges
    stats.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._5 + 1 == b._4,
        s"shard ${a._1} ends at ${a._5} but ${b._1} starts at ${b._4}")
      case _ => ()
    }
  }

  test("assignment is independent of input partitioning and id gaps") {
    import spark.implicits._
    val sparse = Seq(3L, 70L, 200L, 201L, 5000L, 5001L, 99999L)
      .map(i => (i, 1000L)).toDF("id", "b")
    val a = Shards.assign(sparse, "id", "b", 2500L, 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Shards.assign(sparse.repartition(5), "id", "b", 2500L, 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._3) == Set(0L, 1000L, 2000L, 3000L, 4000L, 5000L, 6000L))
  }
}
