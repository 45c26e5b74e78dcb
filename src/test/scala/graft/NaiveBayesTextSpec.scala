package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NaiveBayesText

/** Multinomial NB train/predict: pinned hand-computed micro-nat
  * scores for the `nb_lang_confusion` oracle. */
class NaiveBayesTextSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // pet: cat 2, dog 1 (tot 3); vehicle: car 3, bus 1 (tot 4); V=4
  private val train = Seq(
    (1L, "cat cat dog", "pet"),
    (2L, "car car car bus", "vehicle")
  ).toDF("doc_id", "text", "label")

  private def predictOn(test: org.apache.spark.sql.DataFrame) = {
    val (pt, pl) = NaiveBayesText.train(train, "doc_id", "text", "label")
    NaiveBayesText.predict(test, "doc_id", "text", pt, pl)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("seen terms score with smoothed counts; argmax picks the label") {
    // pet: ln(3/7)+ln(2/7) -> -847298 + -1252763 = -2100061;
    // prior ln(1/2) -> -693148; total -2793209
    val r = NaiveBayesText.predict(
        Seq((3L, "cat dog")).toDF("doc_id", "text"), "doc_id", "text",
        NaiveBayesText.train(train, "doc_id", "text", "label")._1,
        NaiveBayesText.train(train, "doc_id", "text", "label")._2)
      .as[(Long, String, Long)].collect().head
    assert(r == ((3L, "pet", -2793209L)))
  }

  test("unseen-only docs fall back to lp0 and the prior") {
    // vehicle side for "cat dog": 2*ln(1/8) + ln(1/2) =
    // 2*(-2079442) - 693148 = -4852032 < pet's -2793209
    val sym = Seq((1L, "aaa", "x"), (2L, "bbb", "y"))
      .toDF("doc_id", "text", "label")
    val (pt, pl) = NaiveBayesText.train(sym, "doc_id", "text", "label")
    val r = NaiveBayesText.predict(
        Seq((9L, "zzz")).toDF("doc_id", "text"), "doc_id", "text", pt, pl)
      .as[(Long, String, Long)].collect().head
    assert(r._2 == "x", "exact score tie must break to the smaller label")
  }

  test("token-less docs predict the majority prior") {
    val skew = Seq((1L, "aaa", "x"), (2L, "aaa", "x"), (3L, "bbb", "y"))
      .toDF("doc_id", "text", "label")
    val (pt, pl) = NaiveBayesText.train(skew, "doc_id", "text", "label")
    val r = NaiveBayesText.predict(
        Seq((9L, "a")).toDF("doc_id", "text"), "doc_id", "text", pt, pl)
      .as[(Long, String, Long)].collect().head
    // prior-only: floor(1e6*ln(2/3)) = -405466
    assert(r == ((9L, "x", -405466L)))
  }

  test("predictions are partitioning-invariant") {
    val test = Seq((3L, "cat dog"), (4L, "car"), (5L, "bus cat"))
      .toDF("doc_id", "text")
    val a = predictOn(test.repartition(7))
    val b = predictOn(test.coalesce(1))
    assert(a == b)
  }
}
