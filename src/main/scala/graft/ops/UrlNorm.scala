package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for url-level dedup — the first dedup pass of
  * every Common-Crawl-style curation pipeline (CCNet, RefinedWeb: dedupe
  * by normalized URL before any content hashing): pure column
  * expressions (no UDF — the whole normalization stays inside
  * whole-stage codegen and can run in the scan projection).
  *
  * Normalization steps (RFC 3986 §6 safe subset — only transforms that
  * preserve resource identity):
  *   1. drop the fragment (`#...` never reaches the server)
  *   2. lowercase the scheme and host (case-insensitive by spec);
  *      path/query case is preserved (significant by spec)
  *   3. strip the default port (`:443` for https, `:80` for http)
  *   4. sort query parameters (param order is almost never significant;
  *      sorting collapses tracking-reorder duplicates)
  *   5. drop a trailing `?` left by an empty query
  */
object UrlNorm {

  /** Lowercased host without port — the grouping/partition key for
    * per-domain curation stats (domain mix, per-domain quality, crawl
    * budgets). Strips any port (a grouping key wants the registrable
    * host, not the endpoint). Pure column expressions, codegen. */
  def hostOf(url: Column): Column = {
    val preQ = substring_index(substring_index(url, "#", 1), "?", 1)
    val hostPort = substring_index(substring_index(preQ, "://", -1), "/", 1)
    lower(substring_index(hostPort, ":", 1))
  }

  def canonicalizeUrl(url: Column): Column = {
    // 1. fragment off
    val noFrag = substring_index(url, "#", 1)
    // split query off the scheme://host:port/path part
    val preQ = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"), substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    // 2. scheme and host:port lowercase; path untouched
    val scheme = lower(substring_index(preQ, "://", 1))
    val rest = substring_index(preQ, "://", -1) // host[:port]/path...
    val hostPort = substring_index(rest, "/", 1)
    val path = rest.substr(length(hostPort) + 1, length(rest))
    // 3. default ports off
    val host = lower(hostPort)
    val hostNoPort =
      when(scheme === "https", regexp_replace(host, ":443$", ""))
        .when(scheme === "http", regexp_replace(host, ":80$", ""))
        .otherwise(host)
    // 4. query params sorted
    val sortedQ = array_join(sort_array(split(query, "&")), "&")
    // 5. reassemble, dropping the empty query
    concat(scheme, lit("://"), hostNoPort, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the CDX /
    * OpenWayback archive-index key, format public): reversed host
    * labels comma-joined, `www.` and default ports stripped,
    * non-default port kept after the host, `)` separator, lowercased
    * path (`/` when empty), sorted lowercased query. URLs of one site
    * section become one contiguous sorted range — range scans and
    * prefix pruning replace per-url lookups in an archive index.
    *
    * `HTTPS://WWW.Ex.COM:443/P?b=2&a=1#f` → `com,ex)/p?a=1&b=2`.
    * Pinned simplifications: no percent-decoding, no path-dot
    * normalization (identity-preserving transforms only, matching
    * `canonicalizeUrl`'s philosophy). Pure column expressions —
    * codegen, usable in the scan projection. */
  def surtKey(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val preQ = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"),
      substring_index(noFrag, "?", -1)).otherwise(lit(""))
    val scheme = lower(substring_index(preQ, "://", 1))
    val rest = substring_index(preQ, "://", -1) // host[:port]/path...
    val hostPort = lower(substring_index(rest, "/", 1))
    val path = rest.substr(length(hostPort) + 1, length(rest))
    val noDefPort =
      when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .otherwise(hostPort)
    val host = substring_index(noDefPort, ":", 1)
    val port = when(noDefPort.contains(":"),
      concat(lit(":"), substring_index(noDefPort, ":", -1)))
      .otherwise(lit(""))
    val revHost = array_join(
      reverse(split(regexp_replace(host, "^www\\.", ""), "\\.")), ",")
    val pathNorm = when(length(path) === 0, lit("/"))
      .otherwise(lower(path))
    val sortedQ = when(query === "", lit("")).otherwise(
      concat(lit("?"),
        array_join(sort_array(split(lower(query), "&")), "&")))
    concat(revHost, port, lit(")"), pathNorm, sortedQ)
  }
}
