package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level cleaning (Raffel et al. 2020, §2.2 "Colossal
  * Clean Crawled Corpus" heuristics) — the other half of web curation
  * next to Gopher's document-level shape filters: most crawl noise is
  * LINE-grain (nav stubs, cookie banners, code fragments), so C4 keeps
  * only lines that look like prose and then drops pages that have too
  * little left.
  *
  * Per-line keep rule: ends in a terminal punctuation mark
  * (`.` `!` `?` `"`), has at least 5 whitespace words, and does not
  * mention javascript (case-insensitive). Per-doc keep rule: no
  * "lorem ipsum", no `{`, and at least 3 kept lines (documented
  * simplification: C4 counts sentences; kept lines are the line-grain
  * proxy).
  *
  * Scale shape: entirely map-only — split/filter/transform higher-order
  * functions over the line array plus plain string predicates, no UDF,
  * no shuffle; the whole clean rides the scan projection. Downstream
  * roll-ups aggregate the emitted counters.
  */
object C4Clean {

  /** Per-line prose predicate (pure column expression over one line). */
  def lineKeep(l: Column): Column =
    (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
      l.endsWith("\"")) &&
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 5 &&
      !lower(l).contains("javascript")

  /** Adds n_lines, n_kept_lines, c4_keep, and the cleaned text (kept
    * lines re-joined with newlines). */
  def cleanLines(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, lineKeep _)
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept_lines", size(kept).cast("long"))
      .withColumn("c4_keep",
        !lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{") &&
          size(kept) >= 3)
      .withColumn("cleaned", array_join(kept, "\n"))
  }
}
