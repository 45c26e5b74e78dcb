package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar
  * 1996, the assignment scheme crawl fleets use to shard hosts onto
  * fetchers: key k goes to the worker w maximizing h(k, w). Its
  * defining property is MINIMAL DISRUPTION: when a worker leaves, only
  * the keys that were ON that worker move (1/W of the keyspace), where
  * a mod-W scheme reshuffles almost everything.
  *
  * The weight is the repo's pinned 31-bit polynomial rolling hash
  * (h ← h·131 + byte mod 2³¹−1, as in `html.Template`) of
  * `worker + "|" + key`, SQUARED mod the same prime. The squaring is
  * load-bearing: the rolling hash is AFFINE in the key — for a fixed
  * key length, h(w|k) = (C_w + K) mod p with a per-worker CONSTANT
  * offset, so the raw argmax degenerates to the gap structure of the
  * eight constants (a couple of workers win almost everything, as a
  * property test demonstrated). (C_w + K)² mod p breaks the shared
  * offset and the winner varies chaotically with the key. Evaluated
  * as pure `aggregate` higher-order column expressions — no UDF,
  * reimplementable verbatim in the oracle via list_reduce. Ties break
  * to the lexicographically LARGER worker (the struct-max convention
  * in both engines).
  *
  * Scale shape: assignment is computed on the DISTINCT key table
  * (domain cardinality, not corpus cardinality) and broadcast back to
  * the corpus — the corpus itself never shuffles to learn its worker.
  */
object Rendezvous {

  /** Reference implementation of the pinned hash (tests + docs). */
  def hash31(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 131 + s.charAt(i)) % 2147483647L; i += 1 }
    h
  }

  /** The HRW weight: squared rolling hash (see object doc). */
  def weight31(s: String): Long = {
    val h = hash31(s)
    (h * h) % 2147483647L
  }

  /** (keyCol, worker) for every row of `df` — pure column
    * expressions. `df` should be the distinct key table; broadcast
    * the result onto the corpus. */
  def assign(df: DataFrame, keyCol: String,
             workers: Seq[String]): DataFrame = {
    require(workers.nonEmpty, "need at least one worker")
    var cur = df
    val entries: Seq[Column] = workers.zipWithIndex.map { case (w, i) =>
      val kc = s"_rv$i"
      val hc = s"_rh$i"
      cur = cur
        .withColumn(kc, concat(lit(w + "|"), col(keyCol).cast("string")))
        .withColumn(hc, expr(
          s"aggregate(sequence(1, length($kc)), 0L, " +
            s"(a, i) -> (a * 131 + ascii(substring($kc, i, 1))) " +
            "% 2147483647)"))
      struct(expr(s"$hc * $hc % 2147483647").as("h"), lit(w).as("w"))
    }
    cur.select(col(keyCol),
      array_max(array(entries: _*)).getField("w").as("worker"))
  }
}
