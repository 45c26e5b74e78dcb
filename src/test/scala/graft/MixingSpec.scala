package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mixing

/** Temperature-scaled mixing quotas: pinned integer weights/quotas for
  * the `mixing_quotas` oracle. */
class MixingSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // 4 docs of "a", 1 doc of "b": sqrt scaling gives s = 2e6 and 1e6
  private val docs = (Seq.fill(4)("a") ++ Seq("b")).zipWithIndex
    .map { case (g, i) => (i.toLong, g) }.toDF("doc_id", "grp")

  test("alpha=0.5 upweights the low-resource group") {
    val r = Mixing.temperatureQuotas(docs, "grp", budget = 9L)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // total s = 3e6: weights 2/3 and 1/3 in micro; quotas 6 and 3
    assert(r == Map(
      "a" -> ((4L, 666666L, 6L)),
      "b" -> ((1L, 333333L, 3L))))
  }

  test("alpha=1.0 reduces to proportional sampling") {
    val r = Mixing.temperatureQuotas(docs, "grp", budget = 10L,
        alphaPct = 100)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    assert(r == Map("a" -> ((800000L, 8L)), "b" -> ((200000L, 2L))))
  }

  test("quotas never exceed the budget (floor division)") {
    val total = Mixing.temperatureQuotas(docs, "grp", budget = 7L)
      .agg(org.apache.spark.sql.functions.sum("quota_docs"))
      .as[Long].head()
    assert(total <= 7L)
  }

  test("results are partitioning-invariant") {
    val a = Mixing.temperatureQuotas(docs.repartition(5), "grp", 9L)
      .as[(String, Long, Long, Long)].collect().toSet
    val b = Mixing.temperatureQuotas(docs.coalesce(1), "grp", 9L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
