package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** KMV bottom-k aggregate semantics pinned for the `kmv_distinct`
  * oracle. */
class BottomKSpec extends AnyFunSuite {

  private lazy val spark = { GraftExtensions.register(SparkTestBase.spark);
    SparkTestBase.spark }

  test("k smallest DISTINCT values, sorted; short groups return all") {
    import spark.implicits._
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L).toDF("v")
    val got = df.selectExpr("graft_bottomk(v, 3) AS bk")
      .as[Seq[Long]].head()
    assert(got == Seq(1L, 3L, 5L), "duplicates must not occupy slots")
    val short = Seq(42L, 7L).toDF("v")
      .selectExpr("graft_bottomk(v, 8) AS bk").as[Seq[Long]].head()
    assert(short == Seq(7L, 42L))
    val empty = Seq.empty[Long].toDF("v")
      .selectExpr("graft_bottomk(v, 4) AS bk").as[Seq[Long]].head()
    assert(empty == Seq.empty)
  }

  test("partial+final merge across partitions matches single-partition") {
    import spark.implicits._
    val vals = (0L until 10000L).map(i => (i % 64, (i * 7919L) % 100003L))
    val one = vals.toDF("g", "v").coalesce(1)
      .groupBy("g").agg(org.apache.spark.sql.functions.expr(
        "graft_bottomk(v, 16)").as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    val many = vals.toDF("g", "v").repartition(13)
      .groupBy("g").agg(org.apache.spark.sql.functions.expr(
        "graft_bottomk(v, 16)").as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(one == many, "merge must be partitioning-invariant")
    one.values.foreach(bk => assert(bk == bk.sorted && bk.distinct == bk))
  }

  test("plans as ObjectHashAggregate with a partial (map-side) mode") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i % 4, i)).toDF("g", "v")
      .groupBy("g").agg(org.apache.spark.sql.functions.expr(
        "graft_bottomk(v, 4)").as("bk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_graft_bottomk"),
      s"map-side partial aggregation must plan:\n${plan.take(1500)}")
  }

  test("nulls are ignored, not counted") {
    import spark.implicits._
    val df = Seq(Some(4L), None, Some(2L), None).toDF("v")
    assert(df.selectExpr("graft_bottomk(v, 3) AS bk")
      .as[Seq[Long]].head() == Seq(2L, 4L))
  }
}
