package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ParaDedup

/** Paragraph-grain exact dedup (CCNet-style): pinned first-seen
  * semantics, in-order reassembly, and the corpus-wide invariant the
  * `para_dedup` oracle certifies at sf0.01. */
class ParaDedupSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha\n\nCOOKIE BANNER\n\nbody zero"),
    (1L, "COOKIE BANNER\n\nbody one\n\nalpha"),
    (2L, "body two\n\nCOOKIE BANNER"),
    (3L, "COOKIE BANNER\n\nCOOKIE BANNER")
  ).toDF("doc_id", "text")

  test("first corpus-wide occurrence wins under (doc_id, pos) order") {
    val out = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      // doc 0 introduces alpha, the banner, body zero — keeps all 3
      (0L, 3L, 3L, "alpha\n\nCOOKIE BANNER\n\nbody zero"),
      // banner and alpha already seen; only its own body survives
      (1L, 3L, 1L, "body one"),
      (2L, 2L, 1L, "body two"),
      // both paragraphs are repeats — collapses to empty
      (3L, 2L, 0L, "")))
  }

  test("within-doc repeats also dedup (pos breaks the tie)") {
    val d = Seq((7L, "x\n\nx\n\ny")).toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(d, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((7L, 3L, 2L, "x\n\ny")))
  }

  test("empty paragraphs (doubled separators) are occurrences too") {
    // "a\n\n\n\nb" splits to [a, "", b]; the empty paragraph dedups
    // corpus-wide like any other string
    val d = Seq((1L, "a\n\n\n\nb"), (2L, "\n\nc")).toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, "a\n\n\n\nb"),
      (2L, 2L, 1L, "c")))
  }

  test("invariant: every distinct paragraph survives exactly once") {
    val flags = ParaDedup.paragraphFlags(docs, "doc_id", "text")
    val keptPerPara = flags.groupBy("para")
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n"))
      .as[(String, Long)].collect()
    assert(keptPerPara.nonEmpty && keptPerPara.forall(_._2 == 1L))
    // and the kept occurrence is the (doc_id, pos) minimum
    val firsts = flags.filter(col("kept"))
      .select("para", "doc_id", "pos").as[(String, Long, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val all = flags.select("para", "doc_id", "pos").as[(String, Long, Int)]
      .collect().groupBy(_._1)
    for ((para, occ) <- all)
      assert(firsts(para) == occ.map(o => (o._2, o._3)).min)
  }

  test("reassembly is stable across partitionings") {
    val shuffled = ParaDedup.dedupParagraphs(
        docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val plain = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(shuffled == plain)
  }
}
