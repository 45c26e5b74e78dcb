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

  test("AQE splits skewed join partitions at runtime") {
    // one hot key carries ~95% of the left side; with the skew-join
    // thresholds lowered to fixture scale, AQE must mark the sort-merge
    // join as skew-handled (isSkewJoin) instead of leaving one straggler
    // task with the whole hot partition — the runtime half of the §4.2
    // story (deterministic salting is the planned half).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(0, 200000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own query execution (count() would plan
      // a separate aggregate QE and leave this adaptive plan unfinalized)
      assert(joined.queryExecution.toRdd.count() === 200000L)
      val plan = joined.queryExecution.executedPlan
      val finalPlan = plan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(plan)
      // query stages are not reachable via children traversal — assert
      // on the rendered final plan (SortMergeJoin(skew=true) +
      // "AQEShuffleRead coalesced and skewed")
      val planStr = finalPlan.toString
      assert(planStr.contains("skew=true") && planStr.contains("skewed"),
        s"AQE should have marked the skewed join:\n$planStr")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
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
