package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.C4Clean

/** C4 line-level cleaning: pinned per-line and per-doc rule semantics
  * for the `c4_clean` oracle. */
class C4CleanSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def clean(text: String): (Long, Long, Boolean, String) =
    C4Clean.cleanLines(Seq(text).toDF("t"), "t")
      .select("n_lines", "n_kept_lines", "c4_keep", "cleaned")
      .as[(Long, Long, Boolean, String)].collect().head

  test("terminal punctuation, 5-word minimum, javascript rule") {
    val doc = Seq(
      "here is a proper prose sentence.",      // kept
      "too short.",                            // < 5 words
      "this line has five words but no terminal punctuation",
      "please enable JavaScript to continue reading this.",  // js
      "is this a real question we ask?",       // kept
      "he said \"this is quoted speech indeed\"" // kept (quote terminal)
    ).mkString("\n")
    val (n, k, keep, cleaned) = clean(doc)
    assert(n == 6L && k == 3L && keep)
    assert(cleaned ==
      "here is a proper prose sentence.\n" +
      "is this a real question we ask?\n" +
      "he said \"this is quoted speech indeed\"")
  }

  test("lorem ipsum and curly braces drop the whole page") {
    val base = "a good sentence stands right here.\n" * 4
    assert(clean(base.trim)._3)
    assert(!clean(base + "Lorem Ipsum dolor sit.")._3)
    assert(!clean(base + "code { display: none }")._3)
  }

  test("pages with fewer than 3 kept lines drop") {
    val doc = "one good prose sentence stays here.\n" +
      "a second good prose sentence stays."
    val (_, k, keep, _) = clean(doc)
    assert(k == 2L && !keep)
  }

  test("cleaned text of an all-noise page is empty, flags consistent") {
    val (n, k, keep, cleaned) = clean("menu\nlogin\nhome")
    assert(n == 3L && k == 0L && !keep && cleaned == "")
  }
}
