package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** Type-1 exact-quantile semantics pinned for the `length_quantiles`
  * oracle. */
class QuantilesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def q(values: Seq[Long]): (Long, Long, Long, Long) = {
    import spark.implicits._
    Quantiles.exactQuantiles(values.toDF("v"), "v")
      .as[(Long, Long, Long, Long)].collect().head
  }

  test("hand-computed type-1 quantiles, no interpolation ever") {
    // 1..10: p50 rank ceil(5.0)=5 -> 5; p90 rank 9 -> 9; p99 rank 10
    assert(q(1L to 10L) == ((10L, 5L, 9L, 10L)))
    // odd count 1..5: p50 rank ceil(2.5)=3 -> 3
    assert(q(1L to 5L) == ((5L, 3L, 5L, 5L)))
  }

  test("duplicates weight the histogram correctly") {
    // 1 x9, 100 x1: p50 rank 5 -> 1; p90 rank 9 -> 1; p99 rank 10 -> 100
    assert(q(Seq.fill(9)(1L) ++ Seq(100L)) == ((10L, 1L, 1L, 100L)))
  }

  test("single value; partitioning invariance") {
    import spark.implicits._
    assert(q(Seq(7L)) == ((1L, 7L, 7L, 7L)))
    val vs = (0L until 500L).map(i => (i * 37) % 97)
    val a = Quantiles.exactQuantiles(vs.toDF("v"), "v").collect().head
    val b = Quantiles.exactQuantiles(vs.toDF("v").repartition(13), "v")
      .collect().head
    assert(a == b)
  }
}
