package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with the
  * same key whose time is <= the left row's time — the standard
  * training-data primitive for joining events to slowly-changing
  * state (feature snapshots, exchange rates, config versions).
  *
  * Spark has no ASOF JOIN operator; the scalable shape is the
  * union-and-carry-forward trick: tag both sides, union (right rows
  * sorted BEFORE left rows at equal timestamps so `<=` semantics hold),
  * and carry the right payload forward with `last(ignoreNulls)` over a
  * (key, time) window. ONE shuffle on the key — never a range join's
  * O(left x right-per-key) explosion, and no driver-side state. At
  * 100 TB both sides shuffle once on the join key and stream through
  * the window in sort order.
  *
  * The right side must be unique per (key, time) — pre-aggregate it
  * otherwise (ambiguous as-of matches are nondeterministic in any
  * engine). */
object AsofJoin {

  /** @param left      event-grain rows
    * @param right     state-grain rows, unique per (key, time)
    * @param leftKey   join key column in `left`
    * @param rightKey  join key column in `right`
    * @param leftTime  event-time column in `left`
    * @param rightTime effective-from column in `right`
    * @param payload   right columns to carry onto each left row
    * @return `left` columns + `payload` columns (null when no right row
    *         is in effect yet) */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // fail fast on column collisions: the union/window plumbing reserves
    // "__"-prefixed temp names, and payload names must not already exist
    // on the left or the final select would be ambiguous
    val reserved = leftCols.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asofJoin: left columns may not start with '__' (reserved): ${reserved.mkString(", ")}")
    val clashes = payload.filter(leftCols.contains)
    require(clashes.isEmpty,
      s"asofJoin: payload columns already exist on the left side: ${clashes.mkString(", ")}")
    // tag: right rows get order 0 so an exactly-equal timestamp is
    // already "in effect" for the left row (ASOF >= semantics)
    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +:
        lit(0).as("__side") +:
        payload.map(c => col(c).as(s"__p_$c"))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(1).as("__side") +:
        (payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
          leftCols.map(col))): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__c_$c").as(c)): _*)
  }
}
