package graft.analyzers

/** Aho–Corasick multi-pattern counter with Python `str.count` semantics
  * per pattern (non-overlapping, leftmost-greedy per word — independent
  * across words). One pass over the document replaces one `indexOf`
  * sweep per pattern (the T6/T7 indicator tables are ~150 words, i.e.
  * ~150 full-text scans per document without this).
  *
  * From scratch: goto/fail automaton over the pattern set; ASCII (<128)
  * transitions in a flat int array, rarer chars in per-node maps.
  * Matches are emitted via output links at each end position; a match
  * of word w at [s, e) is counted only if s >= lastEnd(w), replicating
  * non-overlapping counting exactly. */
final class MultiPattern(patterns: Seq[String]) {

  val words: Array[String] = patterns.toArray
  private val nWords = words.length

  // --- trie build ---------------------------------------------------------
  private val asciiNext = scala.collection.mutable.ArrayBuffer[Array[Int]]()
  private val wideNext = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.Map[Char, Int]]()
  private val nodeWord = scala.collection.mutable.ArrayBuffer[Int]() // word ending here, -1 none
  private val fail = scala.collection.mutable.ArrayBuffer[Int]()
  private val outLink = scala.collection.mutable.ArrayBuffer[Int]() // nearest suffix node with a word

  private def newNode(): Int = {
    asciiNext += Array.fill(128)(-1)
    wideNext += scala.collection.mutable.Map.empty[Char, Int]
    nodeWord += -1
    fail += 0
    outLink += -1
    asciiNext.length - 1
  }

  private def child(n: Int, c: Char): Int =
    if (c < 128) asciiNext(n)(c) else wideNext(n).getOrElse(c, -1)

  private def setChild(n: Int, c: Char, t: Int): Unit =
    if (c < 128) asciiNext(n)(c) = t else wideNext(n)(c) = t

  locally {
    newNode() // root = 0
    words.zipWithIndex.foreach { case (w, wi) =>
      var n = 0
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        var t = child(n, c)
        if (t < 0) { t = newNode(); setChild(n, c, t) }
        n = t
        i += 1
      }
      // duplicate pattern strings would alias counts; the caller's lists
      // are distinct by construction
      nodeWord(n) = wi
    }
    // BFS fail links
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 128).foreach { c =>
      val t = asciiNext(0)(c)
      if (t >= 0) { fail(t) = 0; queue += t }
    }
    wideNext(0).values.foreach { t => fail(t) = 0; queue += t }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      outLink(n) = if (nodeWord(fail(n)) >= 0) fail(n) else outLink(fail(n))
      def visit(c: Char, t: Int): Unit = {
        var f = fail(n)
        while (f != 0 && child(f, c) < 0) f = fail(f)
        val ft = child(f, c)
        fail(t) = if (ft >= 0 && ft != t) ft else 0
        queue += t
      }
      var c = 0
      while (c < 128) {
        val t = asciiNext(n)(c)
        if (t >= 0) visit(c.toChar, t)
        c += 1
      }
      wideNext(n).foreach { case (ch, t) => visit(ch, t) }
    }
  }

  private val wordLen: Array[Int] = words.map(_.length)

  /** Per-pattern non-overlapping occurrence counts in `text` — exactly
    * `patterns.map(p => PyText.countSub(text, p))`, one pass. */
  def countAll(text: String): Array[Int] = countAllImpl(text, foldCase = false)

  /** countAll over the CASE-FOLDED view of `text` (per-char lowercase,
    * patterns must be lowercase) — equals
    * `countAll(text.toLowerCase(ROOT))` for 1:1-lowercasing input
    * without materializing the lowered copy (a full-document allocation
    * per doc on the analysis path).
    *
    * Non-1:1 guard: U+0130 (LATIN CAPITAL I WITH DOT ABOVE) is the one
    * code point whose ROOT lowercase EXPANDS (İ → "i̇", two chars)
    * — per-char folding would drop the combining dot and can flip
    * adjacency-sensitive counts (e.g. pattern "is" against "İs": the
    * expanded form has the dot between 'i' and 's', the per-char form
    * does not). A cheap pre-scan falls back to the lowered-copy path for
    * the rare documents containing it, so this method equals
    * `countAll(text.toLowerCase(ROOT))` on EVERY input, not just 1:1
    * ones. (Final-sigma Σ→ς is context-dependent but 1:1 in length and
    * never intersects the ASCII pattern tables, so it needs no guard.) */
  def countAllFoldCase(text: String): Array[Int] = {
    var i = 0
    val len = text.length
    var hasExpanding = false
    while (i < len && !hasExpanding) {
      if (text.charAt(i) == 'İ') hasExpanding = true
      i += 1
    }
    if (hasExpanding) countAllImpl(text.toLowerCase(java.util.Locale.ROOT), foldCase = false)
    else countAllImpl(text, foldCase = true)
  }

  private def countAllImpl(text: String, foldCase: Boolean): Array[Int] = {
    val counts = new Array[Int](nWords)
    val lastEnd = new Array[Int](nWords) // exclusive end of last counted match
    java.util.Arrays.fill(lastEnd, -1)
    var n = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val c0 = text.charAt(i)
      val c =
        if (!foldCase) c0
        else if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar
        else if (c0 < 128) c0
        else Character.toLowerCase(c0)
      var t = child(n, c)
      while (n != 0 && t < 0) { n = fail(n); t = child(n, c) }
      n = if (t >= 0) t else 0
      // emit all words ending at i (node + output-link chain)
      var m = if (nodeWord(n) >= 0) n else outLink(n)
      while (m >= 0) {
        val wi = nodeWord(m)
        val start = i + 1 - wordLen(wi)
        if (start >= lastEnd(wi)) { // non-overlapping, leftmost-greedy
          counts(wi) += 1
          lastEnd(wi) = i + 1
        }
        m = outLink(m)
      }
      i += 1
    }
    counts
  }
}
