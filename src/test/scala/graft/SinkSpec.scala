package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.SinkQueries
import graft.ops.SerpCache

/** Sink and cache invariants beyond the oracle hash checks. */
class SinkSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("S9 upsert: update wins, partial update keeps existing, insert stamped") {
    val rows = SinkQueries.qS9Upsert(spark, "").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    assert(rows("g1").getAs[Double]("rating") == 4.6) // updated
    assert(rows("g2").getAs[Double]("rating") == 4.0) // null incoming keeps existing
    assert(rows("g2").getAs[String]("name") == "Old Bar Renamed")
    assert(rows("g3").getAs[String]("first_ingested_date") == "2024-03-01") // untouched
    assert(rows("g4").getAs[String]("first_ingested_date") == "2025-06-01") // insert stamped asOf
  }

  test("S10 conditional append: suppresses fresh, allows >=7d and new keys") {
    val kept = SinkQueries.qS10ConditionalAppend(spark, "").collect()
      .map(r => (r.getString(0), r.getString(4))).toSet
    assert(kept == Set(
      ("p1", "2025-06-07"), // 8 days after latest → allowed
      ("p9", "2025-06-01"), // new poi → allowed
      ("p4", "2025-06-05"))) // exactly 7 days → allowed (>= boundary)
    // ("p1","2025-06-01") at 2 days is suppressed
  }

  test("S4 cache: HIT within TTL, STALE past TTL, MISS when absent") {
    val st = SerpCache.qCacheLookup(spark, "").collect()
      .map(r => r.getString(0) -> (r.getString(4), Option(r.getString(2)))).toMap
    assert(st("q1") == (("HIT", Some("resp1"))))   // 10h old, 24h TTL
    assert(st("q2") == (("STALE", None)))          // 3.5d old, 24h TTL
    assert(st("q3") == (("HIT", Some("resp3"))))   // 30min old, 1h TTL
    assert(st("q4") == (("MISS", None)))
    assert(st("q5") == (("HIT", Some("resp4"))))   // 6.5d old, 7d TTL
  }
}
