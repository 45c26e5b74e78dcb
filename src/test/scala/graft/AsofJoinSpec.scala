package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin

/** As-of join semantics: latest right row with time <= left time per
  * key; equal timestamps count as in effect; no prior row -> null. */
class AsofJoinSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("latest-prior semantics incl. equal-timestamp and no-match null") {
    val events = Seq(
      (1L, 10L, ts("2026-01-01 09:00:00")), // before any rate -> null
      (2L, 10L, ts("2026-01-01 10:00:00")), // == rate A time -> A
      (3L, 10L, ts("2026-01-01 11:30:00")), // between A and B -> A
      (4L, 10L, ts("2026-01-01 12:00:00")), // == rate B -> B
      (5L, 10L, ts("2026-01-02 00:00:00")), // after everything -> B
      (6L, 20L, ts("2026-01-01 12:00:00")), // other key, own rate
      (7L, 30L, ts("2026-01-01 12:00:00"))  // key with no right rows
    ).toDF("event_id", "key", "ts")
    val rates = Seq(
      (10L, ts("2026-01-01 10:00:00"), 1.0), // A
      (10L, ts("2026-01-01 12:00:00"), 2.0), // B
      (20L, ts("2026-01-01 00:00:00"), 9.0)
    ).toDF("rkey", "rts", "rate")

    val got = AsofJoin.asofJoin(events, rates, "key", "rkey", "ts", "rts",
        Seq("rate"))
      .select(col("event_id"), col("rate"))
      .as[(Long, Option[Double])].collect().toMap

    assert(got(1L).isEmpty)
    assert(got(2L).contains(1.0))
    assert(got(3L).contains(1.0))
    assert(got(4L).contains(2.0))
    assert(got(5L).contains(2.0))
    assert(got(6L).contains(9.0))
    assert(got(7L).isEmpty)
  }

  test("reserved/colliding column names fail fast instead of producing ambiguity") {
    val events = Seq((1L, 10L, ts("2026-01-01 09:00:00")))
      .toDF("event_id", "key", "ts")
    val rates = Seq((10L, ts("2026-01-01 08:00:00"), 5.0))
      .toDF("rkey", "rts", "rate")
    // payload name already present on the left
    val clash = events.withColumn("rate", lit(0.0))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(clash, rates, "key", "rkey", "ts", "rts", Seq("rate"))
    }
    assert(e1.getMessage.contains("rate"))
    // reserved temp prefix on the left
    val reserved = events.withColumn("__k", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(reserved, rates, "key", "rkey", "ts", "rts", Seq("rate"))
    }
    assert(e2.getMessage.contains("__"))
  }

  test("left columns pass through untouched and row count is preserved") {
    val events = Seq((1L, 10L, ts("2026-01-01 09:00:00"), "payload"))
      .toDF("event_id", "key", "ts", "extra")
    val rates = Seq((10L, ts("2026-01-01 08:00:00"), 5.0))
      .toDF("rkey", "rts", "rate")
    val out = AsofJoin.asofJoin(events, rates, "key", "rkey", "ts", "rts", Seq("rate"))
    assert(out.columns.toSeq == Seq("event_id", "key", "ts", "extra", "rate"))
    assert(out.count() == 1)
    assert(out.select("extra").as[String].head() == "payload")
  }
}
