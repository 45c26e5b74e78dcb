package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Search

/** Inverted index + BM25 top-k: pinned hand-computed integer scores
  * (independently cross-checked against a DuckDB run of the same
  * rational form) for the `bm25_search` oracle. */
class SearchSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // N=3 docs, L=14 qualifying tokens (len>2 after lowercase split)
  private val docs = Seq(
    (1L, "red fox jumps over the red dog"),
    (2L, "the dog sleeps"),
    (3L, "red red red wine")
  ).toDF("doc_id", "text")

  test("postings carry exact term frequencies") {
    val p = Search.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(p(("red", 1L)) == 2L && p(("red", 3L)) == 3L)
    assert(p(("dog", 1L)) == 1L && p(("dog", 2L)) == 1L)
    val short = Search.postings(
        Seq((9L, "a an ox OX big")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(short == Set("big"), "len<=2 tokens must not index")
  }

  test("docLengths count qualifying tokens only") {
    val l = Search.docLengths(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(l == Map(1L -> 7L, 2L -> 3L, 3L -> 4L))
  }

  test("bm25TopK matches the hand-computed integer scores and order") {
    // idf(red)=idf(dog)=floor(1e6*ln(8/5))=470003; per-(doc,term)
    // score = (idf*22*tf*L) div (10*tf*L + 3*L + 9*len*N), L=14, N=3.
    val r = Search.bm25TopK(docs, "doc_id", "text", Seq("red", "dog"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 2L, 956769L),   // 566578 (red tf=2) + 390191 (dog tf=1)
      (3L, 1L, 761899L),   // red tf=3, shorter doc
      (2L, 1L, 550421L)))  // dog tf=1, shortest doc
  }

  test("k truncates after the (score desc, doc_id) order") {
    val r = Search.bm25TopK(docs, "doc_id", "text", Seq("red", "dog"), 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 956769L)))
  }

  test("docs without any query term never appear") {
    val r = Search.bm25TopK(docs, "doc_id", "text", Seq("sleeps"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(2L))
  }

  test("scores are partitioning-invariant (integer arithmetic)") {
    val a = Search.bm25TopK(docs.repartition(5), "doc_id", "text",
      Seq("red", "dog"), 10).as[(Long, Long, Long)].collect().toSeq
    val b = Search.bm25TopK(docs.coalesce(1), "doc_id", "text",
      Seq("red", "dog"), 10).as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("phraseMatch: consecutive positions only, overlaps count") {
    val pdocs = Seq(
      (1L, "big data big data pipeline"),   // "big data" twice
      (2L, "big big data"),                 // once, after a decoy
      (3L, "data big"),                     // reversed: no match
      (4L, "big and data"),                 // gap: no match
      (5L, "Big Data")                      // case-folds: once
    ).toDF("doc_id", "text")
    val post = Search.positionalPostings(pdocs, "doc_id", "text")
    val got = Search.phraseMatch(post, Seq("big", "data"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 5L -> 1L))
    // trigram across the same stream
    val tri = Search.phraseMatch(post, Seq("big", "data", "pipeline"))
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L))
  }

  test("phraseMatch never matches across documents") {
    val pdocs = Seq((1L, "alpha big"), (2L, "data beta"))
      .toDF("doc_id", "text")
    val post = Search.positionalPostings(pdocs, "doc_id", "text")
    assert(Search.phraseMatch(post, Seq("big", "data")).count() == 0L)
  }
}
