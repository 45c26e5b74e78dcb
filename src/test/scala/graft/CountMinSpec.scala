package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CountMin

/** Count-Min invariants pinned for the `cms_heavy_hitters` oracle. */
class CountMinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("never underestimates; heavy keys are near-exact") {
    import spark.implicits._
    // skewed stream: key 7 dominates, long tail of singletons
    val keys = (Seq.fill(500)(7L) ++ Seq.fill(120)(13L) ++
      (100L until 400L)).map(Tuple1(_))
    val df = keys.toDF("k")
    val sketch = CountMin.build(df, "k", depth = 4, width = 256).persist()
    val exact = keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val est = CountMin.estimate(df.distinct(), sketch, "k", 4, 256)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: ${est(k)} < $n")
    }
    assert(est(7L) <= 500L + 10L, s"heavy key overestimate too large: ${est(7L)}")
    assert(est(13L) <= 120L + 10L)
  }

  test("unseen keys estimate 0 when their cells are empty") {
    import spark.implicits._
    val sketch = CountMin.build(Seq(1L, 2L, 3L).toDF("k"), "k", 4, 4096)
    val est = CountMin.estimate(Seq(999999L).toDF("k"), sketch, "k", 4, 4096)
      .as[(Long, Long)].collect().head._2
    assert(est == 0L, "a key whose 4 cells are all untouched must read 0")
  }

  test("sketch is bounded by depth*width and partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => Tuple1(i % 700)).toDF("k")
    val a = CountMin.build(df, "k", 4, 128)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val b = CountMin.build(df.repartition(11), "k", 4, 128)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.size <= 4 * 128)
    // total mass per row equals the stream length
    (0 until 4).foreach { r =>
      assert(a.filter(_._1 == r).map(_._3).sum == 5000L)
    }
  }
}
