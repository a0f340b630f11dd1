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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_tumbling_windows" -> (qTumblingWindows _))

  val oracles: Map[String, String] = Map(
    "st_tumbling_windows" ->
      """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY window_start_epoch, event_type""".stripMargin)
}
