package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming shapes (SURVEY §2.9): watermarked dedup (mention/
  * snapshot write-suppression as a stream) and sliding event-time windows
  * (momentum aggregates). Each has a batch-equivalent used by the driver's
  * oracle; the streaming variants are exercised in StreamingSpec with a
  * memory sink.
  */
object Streams {

  /** Watermarked exact dedup on a key — the streaming form of the
    * rating-snapshot min-interval suppression / 21-day mention window
    * (SURVEY §2.9 rows 3-4). */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Sliding event-time window aggregation — trailing momentum aggregates
    * (intelligent_classifier.py:133-257 as a stream). */
  def slidingAgg(events: DataFrame, window_ : String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  /** S10 as a STATEFUL stream (SURVEY §2.9 row 3): per (poi, source) the
    * state store keeps the last accepted capture time; a snapshot is emitted
    * only if none accepted yet or ≥ minIntervalDays later
    * (google_places_ingester.py:516-555 semantics, keyed state instead of a
    * table lookup). */
  case class Snapshot(poi_id: String, source_id: String, rating_value: Double,
    reviews_count: Int, captured_at: java.sql.Timestamp)

  def snapshotSuppressionStream(spark: SparkSession,
      snaps: org.apache.spark.sql.Dataset[Snapshot],
      minIntervalDays: Int = 7): org.apache.spark.sql.Dataset[Snapshot] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    snaps.groupByKey(s => (s.poi_id, s.source_id))
      .flatMapGroupsWithState[Long, Snapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, events: Iterator[Snapshot], state: GroupState[Long]) =>
          val out = scala.collection.mutable.ArrayBuffer[Snapshot]()
          var lastAccepted = state.getOption.getOrElse(Long.MinValue)
          events.toSeq.sortBy(_.captured_at.getTime).foreach { s =>
            val t = s.captured_at.getTime
            if (lastAccepted == Long.MinValue ||
              t - lastAccepted >= minIntervalDays * 86400000L) {
              out += s
              lastAccepted = t
            }
          }
          if (lastAccepted != Long.MinValue) state.update(lastAccepted)
          out.iterator
      }
  }

  /** INCREMENTAL corpus near-dup as a STATEFUL stream — the streaming form
    * of [[graft.ops.TextDedup.ddIncrementalNeardup]] (StreamingSpec pins row
    * parity): documents arrive in micro-batches, each computes its MinHash
    * band keys with the same stateless banding projection the batch path
    * uses, and per band key the state store carries the SMALLEST doc_id
    * ever seen — the live form of the persisted LSH index. A document emits
    * one row per band whose state holds a smaller predecessor; the per-doc
    * `min(band_dup_of)` (done by the consumer — a streaming aggregation
    * after flatMapGroupsWithState would need a second stateful stage) is
    * then EXACTLY the batch `dup_of`, independent of micro-batch
    * boundaries: the band min is order-insensitive, so any batching of an
    * id-ordered feed converges to the same owners. State is one long per
    * distinct band key — bounded by the corpus's band vocabulary, the same
    * cardinality the batch join shuffles. */
  def incrementalNeardupStream(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    graft.ops.TextDedup.minhashBandedOf(docs)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, events: Iterator[(Long, String)], state: GroupState[Long]) =>
          var mn = state.getOption.getOrElse(Long.MaxValue)
          val out = Vector.newBuilder[(Long, Long)]
          events.map(_._1).toArray.sorted.foreach { id =>
            if (mn < id) out += ((id, mn))
            if (id < mn) mn = id
          }
          state.update(mn)
          out.result().iterator
      }.toDF("doc_id", "band_dup_of")
  }

  /** SCD2 interval maintenance as a STATEFUL STREAM — the CDC-log form of
    * [[graft.ops.Temporal.snScd2Intervals]]: per entity, fold ordered change
    * events against the open interval held in the state store; a state
    * change CLOSES the open interval (emitted downstream — append mode, so
    * sinks only ever see finalized intervals) and opens the next, which
    * waits in state for the next change. Contract: per-key event-time order
    * ACROSS micro-batches — the order a CDC log already delivers; within a
    * micro-batch the group buffer is sorted, so intra-batch arrival order is
    * free. Emitted rows are exactly the batch build's closed
    * (valid_to != null) intervals — StreamingSpec pins that parity across
    * uneven batch boundaries. State per key is one open interval — O(keys),
    * not O(events). */
  def scd2Stream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, Long, Long), (Long, Long, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, evs: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, String, Long, Long)]) =>
          // open interval: (version, state, valid_from_us, n_events)
          var cur = state.getOption.orNull
          val out = Vector.newBuilder[(Long, Long, String, Long, Long, Long)]
          evs.toArray.sortBy(e => (e._2, e._3)).foreach { case (_, tsUs, _, tpe) =>
            cur match {
              case null => cur = (1L, tpe, tsUs, 1L)
              case (v, st, from, n) =>
                if (st == tpe) cur = (v, st, from, n + 1)
                else {
                  out += ((user, v, st, from, tsUs, n))
                  cur = (v + 1, tpe, tsUs, 1L)
                }
            }
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }.toDF("user_id", "version", "state", "valid_from_us", "valid_to_us", "n_events")
  }

  /** J6 as a STREAM-STREAM interval join: mention events join feed entries
    * on the feed domain, with the entry published in the 3 days up to the
    * mention's capture time. Both sides are watermarked so Spark bounds the
    * join state: a feed entry can be dropped from state once no future
    * mention's 3-day lookback can reach it. The batch equivalent is the
    * oracle-checked `j6_rss_feed_join` (DateEnrichment.scala). */
  def mentionFeedJoinStream(mentions: DataFrame, entries: DataFrame): DataFrame =
    mentions.withWatermark("m_ts", "1 hour")
      .join(entries.withWatermark("e_ts", "1 hour"),
        expr("m_domain = e_domain AND " +
          "e_ts >= m_ts - INTERVAL 3 DAYS AND e_ts <= m_ts"))

  /** Batch equivalent of slidingAgg for cross-checking (and the driver's
    * oracle: tumbling window via epoch-bucket arithmetic). */
  def tumblingAggBatch(events: DataFrame, minutes: Int): DataFrame =
    events
      .groupBy((floor(unix_timestamp(col("ts")) / (minutes * 60)) * (minutes * 60)).as("window_start_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  /** Oracle-checked query: tumbling 6-hour windows over the events table.
    * Day-level epoch bucketing keeps ns-vs-µs truncation out of the compare
    * (bucket boundaries are far from the sub-second precision loss). */
  def qTumblingWindows(spark: SparkSession, dir: String): DataFrame =
    tumblingAggBatch(graft.Tables.events(spark, dir), 360)

  /** Session windows (FIXTURES.md §A): per-user sessions with a 30-minute
    * inactivity gap — batch formulation via gaps-and-islands (lag + cumulative
    * session starts) so the DuckDB oracle replays it exactly. The streaming
    * equivalent is `session_window(ts, '30 minutes')` (sessionWindowStream,
    * exercised in StreamingSpec). */
  def qSessionWindows(spark: SparkSession, dir: String): DataFrame =
    sessionize(graft.Tables.events(spark, dir))

  /** Gaps-and-islands sessionization over any (user_id, event_id, ts, value)
    * relation — shared by the base and `_vol` declared queries. */
  def sessionize(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = 1800
    val prevTs = lag(col("ts"), 1).over(byUser)
    events
      .withColumn("new_session",
        when(prevTs.isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(prevTs) > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .cast("long").as("duration_sec"))
      .withColumn("session_id", col("session_id").cast("long"))
  }

  /** [[qSessionWindows]] at 10× volume (VERDICT r9 item 4): each user is
    * replicated into 10 distinct users (user_id·10+k) with identical event
    * times, so watermark/session semantics are pinned at ~100k events and the
    * query's bench cost is dominated by real sessionization work instead of
    * fixed overhead. The shuffle key (user_id) cardinality grows 10×, which
    * is exactly how the partition-by-user plan scales on a cluster. */
  def qSessionWindowsVol(spark: SparkSession, dir: String): DataFrame =
    // fanned (opt guide §2.5): the ×10 explode otherwise serializes 1M rows
    // into the session-window exchange from the single scan task
    sessionize(graft.Tables.fanOut(graft.Tables.events(spark, dir), col("user_id"))
      .withColumn("k", explode(sequence(lit(0), lit(9))))
      .withColumn("user_id", col("user_id") * 10 + col("k"))
      .drop("k"))

  /** Streaming session windows via the native session_window function. */
  def sessionWindowStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("session_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_tumbling_windows" -> (qTumblingWindows _),
    "st_session_windows" -> (qSessionWindows _),
    "st_session_windows_vol" -> (qSessionWindowsVol _))

  val oracles: Map[String, String] = Map(
    "st_session_windows_vol" ->
      """WITH ev AS (
        |  SELECT user_id * 10 + k AS user_id, event_id, value, ts
        |  FROM events CROSS JOIN range(10) AS r(k)),
        |marked AS (
        |  SELECT user_id, event_id, value, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, round(sum(value), 4) AS session_value,
        |  max(ts_sec) - min(ts_sec) AS duration_sec
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "st_session_windows" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, value, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, round(sum(value), 4) AS session_value,
        |  max(ts_sec) - min(ts_sec) AS duration_sec
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "st_tumbling_windows" ->
      """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY window_start_epoch, event_type""".stripMargin)
}
