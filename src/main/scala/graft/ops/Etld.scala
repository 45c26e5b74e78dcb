package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain (eTLD+1) extraction — the grouping key
  * per-domain curation actually wants: `a.example.co.uk` and
  * `b.example.co.uk` are ONE site (example.co.uk), while grouping by
  * bare host splits it and grouping by last-two-labels merges every
  * `*.co.uk` site into one (the classic blocklist false positive).
  *
  * Algorithm is the public-suffix rule (publicsuffix.org): take the
  * longest matching public suffix, the registrable domain is the
  * suffix plus one label. The suffix table here is a PINNED
  * DEMONSTRATION SUBSET of common two-label suffixes (the algorithm
  * is the point; production swaps in the full Mozilla list, which is
  * pure data with the same shape). Single-label hosts and IPs pass
  * through unchanged.
  *
  * Pure codegen column expressions (split + element_at + CASE) — no
  * UDF, usable in the scan projection next to `UrlNorm.hostOf`.
  */
object Etld {

  /** Pinned demo subset of two-label public suffixes. */
  val TwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "ne.jp", "com.br", "co.in", "co.nz", "com.cn")

  /** Registrable domain of a lowercased host column. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, host)
      .when(n === 2, lastTwo)
      .when(lastTwo.isin(TwoLabelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }
}
