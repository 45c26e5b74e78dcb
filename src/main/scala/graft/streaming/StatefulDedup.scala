package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming exact-dedup with CUSTOM state (SURVEY.md §2.8): across
  * micro-batches, emit each content digest's FIRST document and absorb
  * every later duplicate into a per-key state counter —
  * `flatMapGroupsWithState` over `KeyValueGroupedDataset`, the Spark
  * primitive for state the built-ins can't express (built-in
  * `dropDuplicates` + watermark dedups, but cannot carry the duplicate
  * tally, which is the lineage the reference's queue keeps per job,
  * `local_queue.py:222-229`).
  *
  * State is one small case class per distinct digest — at 100 TB the
  * state store shards by the groupBy key across executors; use a
  * watermark + `GroupStateTimeout.EventTimeTimeout` variant to bound
  * state for unbounded streams (the default here keeps NoTimeout:
  * first-seen semantics are global for a bounded backfill). */
object StatefulDedup {

  final case class DocIn(digest: String, url: String,
      warcTs: java.sql.Timestamp)
  final case class SeenState(count: Long)
  /** First-seen row: emitted once per digest, with the number of
    * duplicates ALREADY seen in the same batch riding along. */
  final case class FirstSeen(digest: String, url: String, batchDups: Long)

  def firstSeen(docs: Dataset[DocIn]): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.digest)
      .flatMapGroupsWithState[SeenState, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digest, rows, state: GroupState[SeenState]) =>
          // deterministic first: smallest (warcTs, url) in this batch
          val batch = rows.toSeq.sortBy(r => (r.warcTs.getTime, r.url))
          val prev = if (state.exists) state.get.count else 0L
          state.update(SeenState(prev + batch.size))
          if (prev == 0L && batch.nonEmpty)
            Iterator.single(FirstSeen(digest, batch.head.url, batch.size - 1L))
          else Iterator.empty
      }
  }

  /** Bounded-state variant for unbounded streams: per-digest state
    * expires once the event-time watermark passes lastSeen + ttl
    * (GroupStateTimeout.EventTimeTimeout) — "first seen within the TTL
    * horizon" semantics, the standard way to keep the state store from
    * growing without bound on an endless crawl. A duplicate arriving
    * after its digest's state expired is re-emitted as a new first-seen
    * (documented and tested). */
  def firstSeenBounded(docs: Dataset[DocIn], watermarkDelay: String = "10 seconds",
      ttlMs: Long = 24L * 3600 * 1000): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withWatermark("warcTs", watermarkDelay)
      .groupByKey(_.digest)
      .flatMapGroupsWithState[SeenState, FirstSeen](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (digest, rows, state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r.warcTs.getTime, r.url))
            val prev = if (state.exists) state.get.count else 0L
            state.update(SeenState(prev + batch.size))
            val maxTs = batch.map(_.warcTs.getTime).max
            // timeout must sit above the current watermark
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            if (prev == 0L && batch.nonEmpty)
              Iterator.single(FirstSeen(digest, batch.head.url, batch.size - 1L))
            else Iterator.empty
          }
      }
  }

  /** File-source wiring: parquet corpus rows landing under `inputDir` →
    * sha-256 digest of the payload → stateful first-seen → parquet sink.
    * AvailableNow drains the backlog (tests / backfills); the same query
    * runs continuously with a ProcessingTime trigger. */
  def start(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(StreamingExtract.inputSchema)
      .parquet(inputDir)
      .select(sha2(coalesce(col("html"), lit(Array.emptyByteArray)), 256).as("digest"),
        col("url"), col("warc_ts").as("warcTs"))
      .as[DocIn]
    val writer = firstSeen(stream).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
