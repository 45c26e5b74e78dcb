package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NgramLm

/** Bigram LM scoring (CCNet-style reference-corpus quality signal):
  * pinned counts/smoothing/quantization semantics for the `lm_score`
  * oracle. */
class NgramLmSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("hand-computed add-one bigram probabilities, exactly") {
    // reference "a b a b": bigrams (a,b)x2, (b,a)x1; head counts
    // c1(a)=2, c1(b)=1; distinct heads {a,b} -> V=2
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val row = NgramLm.scoreDocs(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val pAB = (2.0 + 1) / (2 + 2)   // c2=2, c1(a)=2, V=2
    val pBC = (0.0 + 1) / (1 + 2)   // unseen bigram, c1(b)=1
    val expectedSum =
      math.floor(math.log(pAB) * 1e6).toLong +
      math.floor(math.log(pBC) * 1e6).toLong
    assert(row == ((1L, 2L, 1L, expectedSum,
      expectedSum.toDouble / 2 / 1e6)))
  }

  test("reference-like text outscores out-of-distribution text") {
    val ref = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "zzz qqq www vvv kkk")).toDF("doc_id", "text")
    val scores = NgramLm.scoreDocs(docs, ref, "doc_id", "text")
      .select("doc_id", "avg_logprob", "n_oov")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scores(10L)._1 > scores(11L)._1,
      s"in-distribution doc must score higher: $scores")
    assert(scores(10L)._2 == 0L && scores(11L)._2 == 4L)
  }

  test("tokenization: lowercased, whitespace-split, empties dropped") {
    val ref = Seq((0L, "  A  b\t\nA b ")).toDF("doc_id", "text")
    val docs = Seq((1L, "a B")).toDF("doc_id", "text")
    val row = NgramLm.scoreDocs(docs, ref, "doc_id", "text")
      .select("n_bigrams", "n_oov").as[(Long, Long)].collect().head
    assert(row == ((1L, 0L)))   // "a b" is a reference bigram
  }

  test("docs with fewer than two tokens have no bigrams and drop") {
    val ref = Seq((0L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val ids = NgramLm.scoreDocs(docs, ref, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("score is stable across partitionings (order-free integer sum)") {
    val ref = Seq.tabulate(20)(i => (i.toLong, s"w$i x${i % 3} y z w$i"))
      .toDF("doc_id", "text")
    val docs = ref
    val a = NgramLm.scoreDocs(docs, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Double)].collect().toSeq
    val b = NgramLm.scoreDocs(docs.repartition(7), ref.repartition(3),
        "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(a == b)
  }
}
