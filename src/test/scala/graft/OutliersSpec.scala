package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Outliers

/** Lower-median/MAD semantics pinned for the `host_outliers` oracle. */
class OutliersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def run(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    Outliers.hostMadOutliers(
        rows.toDF("doc_id", "host", "v"), "doc_id", "host", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("odd count: true middle; outlier gate is 3*1.4826*MAD") {
    // h1 values 10,12,14,16,1000: med=14, |x-med|=4,2,0,2,986 ->
    // MAD (sorted 0,2,2,4,986, lower median rank 3) = 2;
    // gate: 10000*av > 44478*2 = 88956 -> av > 8.8956 -> only 986
    val got = run(Seq((1L, "h1", 10L), (2L, "h1", 12L), (3L, "h1", 14L),
      (4L, "h1", 16L), (5L, "h1", 1000L)))
    assert(got("h1") == ((5L, 14L, 2L, 1L)))
  }

  test("even count picks the LOWER median, never interpolates") {
    // h2 values 10,20,30,40 -> rank (4+1) div 2 = 2 -> med=20
    // |x-20| = 10,0,10,20 sorted 0,10,10,20 -> rank 2 -> MAD=10
    // gate av > 44.478 -> none
    val got = run(Seq((1L, "h2", 10L), (2L, "h2", 20L), (3L, "h2", 30L),
      (4L, "h2", 40L)))
    assert(got("h2") == ((4L, 20L, 10L, 0L)))
  }

  test("zero MAD: any deviation is an outlier; hosts are independent") {
    val got = run(Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L),
      (4L, "a", 6L), (5L, "b", 100L)))
    // a: med=5, MAD=0, gate 10000*av > 0 -> the 6 is an outlier
    assert(got("a") == ((4L, 5L, 0L, 1L)))
    // singleton host: med = its value, MAD 0, no outlier
    assert(got("b") == ((1L, 100L, 0L, 0L)))
  }

  test("result is independent of input partitioning") {
    import spark.implicits._
    val rows = (0L until 200L).map(i =>
      (i, s"h${i % 5}", (i * 37) % 101))
    val df = rows.toDF("doc_id", "host", "v")
    val a = Outliers.hostMadOutliers(df, "doc_id", "host", "v")
      .collect().map(_.toString).sorted.toSeq
    val b = Outliers.hostMadOutliers(df.repartition(13), "doc_id",
        "host", "v")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
