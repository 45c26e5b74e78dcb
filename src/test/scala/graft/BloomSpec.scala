package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bloom

/** Bloom seen-set invariants pinned for the `bloom_seen` oracle. */
class BloomSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("no false negatives, ever; unseen keys mostly miss") {
    import spark.implicits._
    val seen = (0L until 400L).toDF("key")
    val bitmap = Bloom.build(seen, "key", mBits = 4096, k = 3)
    val candidates = (0L until 1000L).toDF("key")
    val probed = Bloom.probe(candidates, bitmap, "key", 4096, 3)
      .as[(Long, Boolean)].collect().toMap
    (0L until 400L).foreach { id =>
      assert(probed(id), s"false negative for seen key $id")
    }
    val fps = (400L until 1000L).count(probed(_))
    assert(fps < 120, s"FP count $fps implausibly high for 400/4096-bit load")
    assert(fps > 0, "a 400-key load on 4096 bits should produce some FPs")
  }

  test("bitmap is word-packed: at most m/64 rows, words in range") {
    import spark.implicits._
    val bitmap = Bloom.build((0L until 500L).toDF("key"), "key", 2048, 3)
      .as[(Long, Long)].collect()
    assert(bitmap.length <= 2048 / 64)
    assert(bitmap.forall { case (w, _) => w >= 0 && w < 32 })
  }

  test("probe result is independent of candidate partitioning") {
    import spark.implicits._
    val seen = (0L until 200L by 2L).toDF("key")
    val bitmap = Bloom.build(seen, "key", 1024, 4).persist()
    val cands = (0L until 200L).toDF("key")
    val a = Bloom.probe(cands, bitmap, "key", 1024, 4)
      .as[(Long, Boolean)].collect().toSet
    val b = Bloom.probe(cands.repartition(7), bitmap, "key", 1024, 4)
      .as[(Long, Boolean)].collect().toSet
    assert(a == b)
    bitmap.unpersist()
  }
}
