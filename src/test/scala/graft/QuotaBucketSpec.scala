package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.QuotaBucket
import graft.streaming.QuotaBucket.{Admission, Request}

/** Token-bucket admission: batch==stream parity across a simulated UTC
  * midnight, and the reference's consume-on-admit-only contract. */
class QuotaBucketSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  val DayUs = QuotaBucket.DayUs
  // day D has 5 requests against limit 3 for type "places" (2 deferred),
  // then the bucket refills at midnight and day D+1 admits again; type
  // "serp" never exhausts — state isolation between keys
  val Limit = 3
  val fixture: Seq[Request] = Seq(
    Request(1, "places", 100L * DayUs + 1000),
    Request(2, "places", 100L * DayUs + 2000),
    Request(3, "places", 100L * DayUs + 3000),
    Request(4, "places", 100L * DayUs + 4000), // deferred (bucket empty)
    Request(5, "places", 100L * DayUs + 5000), // deferred
    Request(6, "serp", 100L * DayUs + 1500),
    Request(7, "places", 101L * DayUs + 10),   // past midnight: refilled
    Request(8, "places", 101L * DayUs + 20),
    Request(9, "serp", 101L * DayUs + 30))

  def batchLedger: Map[Long, Admission] = {
    import spark.implicits._
    val df = fixture.toDF()
      .select(col("request_id"), col("api_type"),
        timestamp_micros(col("ts_us")).as("ts"))
    QuotaBucket.admissionBatch(df, Limit).as[Admission]
      .collect().map(a => a.request_id -> a).toMap
  }

  test("batch ledger: admit to the cap, defer past it, refill at midnight") {
    val led = batchLedger
    assert((1L to 3L).forall(led(_).admitted))
    assert(!led(4).admitted && !led(5).admitted)
    assert(led(4).tokens_remaining == 0 && led(5).tokens_remaining == 0)
    assert(led(6).admitted && led(6).tokens_remaining == 2) // own key, own bucket
    assert(led(7).admitted && led(7).tokens_remaining == 2) // day rolled: refilled
    assert(led(8).admitted && led(9).admitted)
    assert(led(7).day_idx == 101 && led(4).day_idx == 100)
  }

  test("stream parity: micro-batches split across midnight replay the batch ledger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Request]
    val q = QuotaBucket.admissionStream(spark, input.toDS(), Limit)
      .writeStream.format("memory").queryName("quota_out").outputMode("append").start()
    try {
      // feed time-ordered but batched ARBITRARILY relative to the day
      // boundary: batch 2 crosses midnight inside itself
      input.addData(fixture(0), fixture(1), fixture(5))
      q.processAllAvailable()
      input.addData(fixture(2), fixture(3), fixture(4), fixture(6))
      q.processAllAvailable()
      input.addData(fixture(7), fixture(8))
      q.processAllAvailable()
      val streamed = spark.sql("select * from quota_out").as[Admission]
        .collect().map(a => a.request_id -> a).toMap
      val led = batchLedger
      assert(streamed.keySet == led.keySet)
      led.foreach { case (id, a) =>
        assert(streamed(id) == a, s"request $id: stream=${streamed(id)} batch=$a")
      }
    } finally q.stop()
  }
}
