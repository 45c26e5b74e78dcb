package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyTitle

/** Blocked Levenshtein near-dup semantics pinned for the
  * `fuzzy_titles` oracle. */
class FuzzyTitleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("radius, ordering, and block isolation") {
    import spark.implicits._
    val df = Seq(
      (1L, "Widget Pro"), (2L, "Widget Pros"),     // dist 1
      (3L, "Widget Pro!!"),                        // dist 2 to #1, 3 to #2
      (4L, "Widget Professional Edition"),         // dist > 2 to all
      (5L, "Gadget Pro")                           // different block
    ).toDF("doc_id", "title")
    val got = FuzzyTitle.nearDupPairs(df, "doc_id", "title", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 2)),
      "dist>2 drops ((1,4) etc.); Gadget sits in another block; " +
        "(2,3) is Pros->Pro!! = sub s->! + insert ! = 2")
  }

  test("prefix blocking bounds candidates: cross-block pairs never form") {
    import spark.implicits._
    val df = Seq((1L, "aaaaaa1"), (2L, "bbbbbb1")).toDF("doc_id", "title")
    assert(FuzzyTitle.nearDupPairs(df, "doc_id", "title", 10).count() == 0L,
      "documented contract: pairs differing inside the prefix are missed")
  }

  test("result is independent of input partitioning") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"Item ${i / 4}"))
      .toDF("doc_id", "title")
    val a = FuzzyTitle.nearDupPairs(df, "doc_id", "title", 1)
      .as[(Long, Long, Int)].collect().toSet
    val b = FuzzyTitle.nearDupPairs(df.repartition(7), "doc_id", "title", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
