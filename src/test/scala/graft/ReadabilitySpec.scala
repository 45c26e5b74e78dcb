package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Readability

/** Integer-exact readability semantics pinned for the `readability`
  * oracle. */
class ReadabilitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def row(text: String): (Long, Long, Long, Option[Long], Option[Long]) = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Readability.withReadability(df, "text")
      .select("n_words", "n_sentences", "n_syllables", "flesch_milli",
        "fk_milli")
      .as[(Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
  }

  test("hand-computed counts and milli scores") {
    // words: the, cat, sat = 3; sentences: 1; syllables: e,a,a = 3
    val (w, s, y, f, g) = row("the cat sat.")
    assert((w, s, y) == (3L, 1L, 3L))
    // flesch = 206835 - (1015*3) div 1 - (84600*3) div 3 = 119190
    assert(f.contains(206835L - 3045L - 84600L))
    // fk = (390*3) div 1 + (11800*3) div 3 - 15590 = 1170+11800-15590
    assert(g.contains(1170L + 11800L - 15590L))
  }

  test("sentence runs collapse; floor at one sentence") {
    assert(row("Stop!! Go now... done")._2 == 2L,
      "!! and ... are single runs; trailing text without punctuation " +
        "adds no sentence")
    assert(row("no terminator at all")._2 == 1L)
  }

  test("all-consonant words get the one-syllable floor") {
    // words: shh, pfft, ok = 3; vowel groups: o = 1; consonant-only:
    // shh, pfft = 2 -> syllables 3
    assert(row("shh pfft ok.")._3 == 3L)
  }

  test("vowel groups count once per run, case-insensitive") {
    // "queueing" -> ueuei as runs: ueuei is one run? u-e-u-e-i all
    // vowels contiguous -> 1 group + ng consonants; "AEIOU" 1 group
    assert(row("queueing AEIOU.")._3 == 2L)
  }

  test("numbers are not words") {
    val (w, _, _, _, _) = row("version 42 shipped in 2024.")
    assert(w == 3L, "42 and 2024 are not letter runs")
  }

  test("empty text yields NULL scores, zero words") {
    val (w, s, _, f, g) = row("")
    assert(w == 0L && s == 1L && f.isEmpty && g.isEmpty)
  }
}
