package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Daily API-quota TOKEN BUCKET (VERDICT r13 item 4) — the reference's
  * UTC-reset budget gate (google_places_ingester.py:44-74 `_init_token_bucket`
  * / `_consume_token`, utils/api_usage.py:14-46 daily ledger) as BOTH a batch
  * admission ledger and a stateful stream, with pinned parity.
  *
  * Semantics (the reference's): each api_type holds `DailyLimit` tokens; a
  * request consumes one iff tokens remain; the bucket refills at the UTC day
  * boundary (reset_hour_utc = 0, google_places_ingester.py:36); a blocked
  * request consumes nothing and is reported deferred, not dropped. Within a
  * day requests are ordered by (ts, request_id) — the deterministic stand-in
  * for the reference's arrival order.
  *
  * Batch form: one window function — row_number per (api_type, utc_day)
  * ordered by (ts, id); admitted = seq <= limit. One shuffle on the
  * partition key, no state, scales as any windowed aggregation.
  *
  * Stream form: `flatMapGroupsWithState` keyed by api_type, state = (current
  * day index, requests seen today) — two longs per api_type, O(|api_types|)
  * state total. The day-boundary reset happens inside the handler when a
  * request's day index advances past the state's, so a midnight crossing
  * INSIDE a micro-batch behaves identically to one between micro-batches
  * (QuotaBucketSpec pins batch==stream on a feed split across midnight).
  */
object QuotaBucket {

  /** Tokens per api_type per UTC day. The reference reads its limit from
    * deploy config (config.py `daily_api_limit`); 50 is chosen so the fixture
    * tables exercise both admission and exhaustion at every test SF. */
  val DailyLimit = 50

  val DayUs: Long = 86400L * 1000000

  // ----------------------------------------------------------- batch form

  /** Admission ledger over any (request_id, api_type, ts) frame. */
  def admissionBatch(requests: DataFrame, limit: Int = DailyLimit): DataFrame = {
    val w = Window.partitionBy(col("api_type"), col("day_idx"))
      .orderBy(col("ts").asc, col("request_id").asc)
    requests
      .withColumn("day_idx", expr(s"unix_micros(ts) div $DayUs"))
      .withColumn("seq", row_number().over(w))
      .select(col("request_id"), col("api_type"), col("day_idx"),
        col("seq").cast("long").as("seq"),
        (col("seq") <= limit).as("admitted"),
        greatest(lit(0), lit(limit) - col("seq")).cast("long").as("tokens_remaining"))
  }

  /** The declared query: the event log as the request ledger (event_type =
    * api_type — each source the reference meters is one key). */
  def qQuotaAdmission(spark: SparkSession, dir: String): DataFrame =
    admissionBatch(Tables.events(spark, dir)
      .select(col("event_id").as("request_id"), col("event_type").as("api_type"),
        col("ts")))

  // ---------------------------------------------------------- stream form

  case class Request(request_id: Long, api_type: String, ts_us: Long)
  case class Admission(request_id: Long, api_type: String, day_idx: Long,
    seq: Long, admitted: Boolean, tokens_remaining: Long)

  /** Stateful admission stream. State per api_type is (day index, requests
    * seen that day); `seq` increments for every request (admitted or not) so
    * `admitted = seq <= limit` and `used = min(seq, limit)` need no second
    * counter — exactly the batch row_number contract. Requests inside one
    * micro-batch are ordered by (ts, id) before folding, so any batching of
    * a time-ordered feed converges to the batch ledger. */
  def admissionStream(spark: SparkSession, requests: Dataset[Request],
      limit: Int = DailyLimit): Dataset[Admission] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    requests.groupByKey(_.api_type)
      .flatMapGroupsWithState[(Long, Long), Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch: Iterator[Request], state: GroupState[(Long, Long)]) =>
          var (day, seen) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer[Admission]()
          batch.toSeq.sortBy(r => (r.ts_us, r.request_id)).foreach { r =>
            val d = Math.floorDiv(r.ts_us, DayUs)
            if (d > day) { day = d; seen = 0L } // UTC-midnight refill
            seen += 1
            out += Admission(r.request_id, key, d, seen, seen <= limit,
              math.max(0L, limit - seen))
          }
          state.update((day, seen))
          out.iterator
      }
  }

  // -------------------------------------------------------------- oracle

  val queries: Map[String, graft.ops.Relational.Q] = Map(
    "quota_admission" -> (qQuotaAdmission _))

  val oracles: Map[String, String] = Map(
    "quota_admission" ->
      s"""WITH req AS (
         |  SELECT event_id AS request_id, event_type AS api_type, ts,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day_idx
         |  FROM events),
         |seqd AS (
         |  SELECT request_id, api_type, day_idx,
         |    row_number() OVER (PARTITION BY api_type, day_idx
         |                       ORDER BY ts ASC, request_id ASC) AS seq
         |  FROM req)
         |SELECT request_id, api_type, day_idx, CAST(seq AS BIGINT) AS seq,
         |  seq <= $DailyLimit AS admitted,
         |  CAST(greatest(0, $DailyLimit - seq) AS BIGINT) AS tokens_remaining
         |FROM seqd""".stripMargin)
}
