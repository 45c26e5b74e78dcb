package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted two-phase aggregation (SURVEY.md §4.2): result-equivalence
  * with the direct groupBy on a skewed key distribution, and
  * determinism of the salt assignment (resume-safe, unlike rand()). */
class SkewSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // 90% of rows share one hot key — the pathological shape
  private lazy val skewed = spark.range(0, 20000).select(
    when(col("id") % 10 =!= 0, "hot.example").otherwise(concat(lit("host"), col("id") % 50))
      .as("domain"),
    col("id").as("row_id"),
    (col("id") % 997).cast("double").as("value"))

  test("salted count equals direct groupBy count") {
    val direct = skewed.groupBy("domain").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "domain", "row_id", salt = 16)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("salted stats equal direct aggregation") {
    val direct = skewed.groupBy("domain")
      .agg(sum("value").as("total"), count("value").as("cnt"),
        min("value").as("min"), max("value").as("max"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedStats(skewed, "domain", "value", "row_id", salt = 16)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (t, c, mn, mx)) =>
      val (dt, dc, dmn, dmx) = direct(k)
      assert(c == dc && mn == dmn && mx == dmx)
      assert(math.abs(t - dt) < 1e-6 * math.max(1.0, math.abs(dt)),
        s"sum mismatch for $k") // double sum order differs across salts
    }
  }

  test("salt assignment is deterministic across runs") {
    val a = skewed.withColumn("s", Skew.saltCol(col("row_id"), 16))
      .select("row_id", "s").as[(Long, Int)].collect().toMap
    val b = skewed.repartition(7).withColumn("s", Skew.saltCol(col("row_id"), 16))
      .select("row_id", "s").as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.size > 8, "salt should spread across buckets")
  }
}
