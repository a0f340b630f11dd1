package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CellFsm, Streams}

/** Structured Streaming behavior: the FSM over the state store across
  * micro-batches, watermarked dedup, and streaming-vs-batch window parity. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("streaming FSM: saturation splits, children scan in later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CellFsm.ScanResult]
    val q = CellFsm.streamingFsm(spark, input.toDS())
      .writeStream.format("memory").queryName("fsm_out").outputMode("append").start()
    try {
      // batch 1: res-9 cell saturates → split + 7 pending children (aperture 7)
      input.addData(CellFsm.ScanResult("h9:100:200", 70, 25, "2025-06-01 00:00:00"))
      q.processAllAvailable()
      val b1 = spark.sql("select * from fsm_out").as[CellFsm.CellState].collect()
      assert(b1.exists(s => s.h3 == "h9:100:200" && s.status == "split" && s.attempts == 1))
      val children = b1.filter(_.status == "pending")
      assert(children.length == 7 && children.forall(_.res == 10))

      // batch 2: same cell scanned again → state persisted, attempts increments
      input.addData(CellFsm.ScanResult("h9:100:200", 10, 3, "2025-06-08 00:00:00"))
      q.processAllAvailable()
      val b2 = spark.sql("select * from fsm_out").as[CellFsm.CellState].collect()
      assert(b2.exists(s => s.h3 == "h9:100:200" && s.status == "scanned" && s.attempts == 2),
        "state store must carry attempts across micro-batches")

      // batch 3: a child cell gets scanned normally
      input.addData(CellFsm.ScanResult("h10:200:400", 5, 2, "2025-06-09 00:00:00"))
      q.processAllAvailable()
      val b3 = spark.sql("select * from fsm_out").as[CellFsm.CellState].collect()
      assert(b3.exists(s => s.h3 == "h10:200:400" && s.status == "scanned"
        && s.nextDueAt.exists(_.startsWith("2025-06-16"))))
    } finally q.stop()
  }

  test("watermarked dedup drops duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = Streams.dedupStream(df)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2025-06-01 10:00:00")
      input.addData((1L, t0, 1.0), (1L, t0, 1.0), (2L, t0, 2.0))
      q.processAllAvailable()
      input.addData((2L, t0, 2.0), (3L, t0, 3.0)) // dup across batches
      q.processAllAvailable()
      val ids = spark.sql("select event_id from dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from dedup state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = Streams.dedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      input.addData((1L, java.sql.Timestamp.valueOf("2025-06-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // advance the watermark well past 10:00
      input.addData((2L, java.sql.Timestamp.valueOf("2025-06-01 12:00:00"), 2.0))
      q.processAllAvailable()
      // a late duplicate of id 1 AND a late new id arrive hours behind the
      // watermark: both are dropped (late beyond watermark), state for id 1
      // having been evicted does NOT resurrect the duplicate
      input.addData((1L, java.sql.Timestamp.valueOf("2025-06-01 09:00:00"), 1.0),
        (3L, java.sql.Timestamp.valueOf("2025-06-01 09:30:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.sql("select event_id from late_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L), s"late rows must be dropped, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("streaming session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = Streams.sessionWindowStream(df)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (1L, ts("2025-06-01 10:00:00"), 7L, 1.0),
        (2L, ts("2025-06-01 10:20:00"), 7L, 2.0),  // same session (gap 20m < 30m)
        (3L, ts("2025-06-01 11:30:00"), 7L, 3.0))  // new session
      input.addData((9L, ts("2025-06-01 20:00:00"), 99L, 0.0)) // close windows
      q.processAllAvailable()
      val sessions = spark.sql(
        "select user_id, n_events, session_value from sess_out where user_id = 7")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(sessions == Set((2L, 3.0), (1L, 3.0)),
        s"expected one 2-event and one 1-event session, got $sessions")
    } finally q.stop()
  }

  test("stateful snapshot suppression across micro-batches (S10 stream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Snapshot]
    val q = Streams.snapshotSuppressionStream(spark, input.toDS())
      .writeStream.format("memory").queryName("snap_out").outputMode("append").start()
    try {
      def snap(d: String, rc: Int) = Streams.Snapshot("p1", "google", 4.5, rc,
        java.sql.Timestamp.valueOf(d))
      input.addData(snap("2025-06-01 00:00:00", 10), snap("2025-06-03 00:00:00", 12))
      q.processAllAvailable() // first accepted, +2d suppressed
      input.addData(snap("2025-06-05 00:00:00", 14)) // +4d vs state → suppressed
      q.processAllAvailable()
      input.addData(snap("2025-06-09 00:00:00", 20)) // +8d vs state → accepted
      q.processAllAvailable()
      val kept = spark.sql("select reviews_count from snap_out")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(kept == Seq(10, 20),
        s"state must persist the last accepted capture across batches, got $kept")
    } finally q.stop()
  }

  test("streaming sliding window matches batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "2025-06-01 10:05:00", "a", 1.0),
      (2L, "2025-06-01 10:20:00", "a", 2.0),
      (3L, "2025-06-01 10:40:00", "b", 3.0),
      (4L, "2025-06-01 11:10:00", "a", 4.0))
      .map { case (i, t, e, v) => (i, java.sql.Timestamp.valueOf(t), e, v) }
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val sdf = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Streams.slidingAgg(sdf).writeStream
      .format("memory").queryName("win_out").outputMode("append").start()
    try {
      input.addData(rows: _*)
      // advance watermark far enough to close all windows
      input.addData((99L, java.sql.Timestamp.valueOf("2025-06-01 20:00:00"), "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        "select window.start as ws, event_type, n, sum_value from win_out where event_type != 'z'")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batchDf = rows.toDF("event_id", "ts", "event_type", "value")
      val batch = batchDf
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }
}
