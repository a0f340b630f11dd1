package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Temporal

/** Pins the temporal-operator invariants that the driver's value-hash compare
  * cannot express:
  *
  *  - SCD2 intervals must TILE each user's history — contiguous (each
  *    valid_to equals the next valid_from), versions dense from 1, exactly
  *    one open (current) interval, and change-compressed (adjacent states
  *    differ; a run never splits).
  *  - The point-in-time snapshot must agree with the SCD2 interval that
  *    CONTAINS the snapshot instant — two independent dataflows (max-struct
  *    aggregate vs windowed interval build) over the same log.
  *  - The bucketed interval-overlap join must be pair-for-pair identical to
  *    the naive theta form AND plan with no nested-loop/cartesian operator —
  *    the whole point of the bucket explode is that candidates meet through
  *    a shuffle equi-join.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private val asOfUs: Long =
    java.time.Instant.parse("2024-01-15T12:00:00Z").toEpochMilli * 1000L

  test("SCD2 intervals tile each user's history") {
    val rows = Temporal.snScd2Intervals(spark, sf)
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"), col("is_current"))
      .collect() // sf0.01: ~10k intervals — test-side only
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    val nEvents = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (user, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"user $user: versions not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $user: interval chain broken at version ${a.getLong(1)}")
          assert(a.getString(2) != b.getString(2),
            s"user $user: adjacent intervals share state — not change-compressed")
        case _ =>
      }
      assert(sorted.count(_.isNullAt(4)) == 1 && sorted.last.isNullAt(4),
        s"user $user: exactly the last interval must be open")
      assert(sorted.map(_.getBoolean(6)).toSeq == sorted.map(_.isNullAt(4)).toSeq,
        s"user $user: is_current must mirror the open interval")
      assert(sorted.map(_.getLong(5)).sum == nEvents(user),
        s"user $user: run event counts must partition the log")
    }
  }

  test("PIT snapshot equals the SCD2 interval containing the instant") {
    val fromIntervals = Temporal.snScd2Intervals(spark, sf)
      .filter(col("valid_from_us") <= asOfUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
      .select(col("user_id"), col("state"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val snapshot = Temporal.snPitSnapshot(spark, sf)
      .select(col("user_id"), col("state"), col("staleness_us"))
      .collect()
    assert(snapshot.nonEmpty)
    assert(snapshot.map(r => r.getLong(0) -> r.getString(1)).toMap == fromIntervals,
      "snapshot state disagrees with the containing SCD2 interval")
    snapshot.foreach(r => assert(r.getLong(2) >= 0, "snapshot read the future"))
  }

  test("gap sessions: events within a session are <= gap apart, sessions > gap apart") {
    val w10 = Temporal.w10GapSessions(spark, sf).collect()
    assert(w10.nonEmpty)
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)).sorted }
    w10.groupBy(_.getLong(0)).foreach { case (user, sessions) =>
      val sorted = sessions.sortBy(_.getLong(2))
      // session count == 1 + number of > gap jumps in the user's timeline
      val jumps = events(user).sliding(2).count {
        case Array(a, b) => b - a > Temporal.SessionGapUs; case _ => false }
      assert(sorted.length == jumps + 1, s"user $user: wrong session count")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getLong(2) + a.getLong(3) // start + duration
          assert(b.getLong(2) - aEnd > Temporal.SessionGapUs,
            s"user $user: adjacent sessions closer than the gap")
        case _ =>
      }
      assert(sorted.map(_.getLong(4)).sum == events(user).length,
        s"user $user: session event counts must partition the log")
    }
  }

  test("state timeline: per-day totals equal users whose history started by that midnight") {
    val timeline = Temporal.snStateTimeline(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(timeline.nonEmpty)
    val firstSeen = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"))
      .collect().map(_.getLong(1))
    timeline.foreach { case (dayIdx, total) =>
      val midnightUs = dayIdx * Temporal.DayUs
      val expected = firstSeen.count(_ <= midnightUs)
      assert(total == expected,
        s"day $dayIdx: $total users on the timeline vs $expected with history")
    }
    // the horizon day is present and counts every user (all intervals open or past)
    assert(timeline.contains(Temporal.TimelineEndDay) &&
      timeline(Temporal.TimelineEndDay) == firstSeen.length)
  }

  test("incremental SCD2 merge equals the full rebuild for any split") {
    def fmt(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    val full = fmt(Temporal.snScd2Intervals(spark, sf))
    assert(full.nonEmpty && fmt(Temporal.snScd2Merge(spark, sf)) == full,
      "mid-log merge diverges from the full rebuild")
    // degenerate splits: everything in the base (delta empty) and
    // everything in the delta (base empty) must agree with each other
    val log = Tables.events(spark, sf).select(col("user_id"), col("ts"),
      col("event_id"), col("event_type"), lit(1L).as("weight"))
    val none = log.filter(lit(false))
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(col("user_id"),
      col("version"), col("state"), unix_micros(col("vf")).as("f"),
      unix_micros(col("vt")).as("t"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
        r.getLong(5))).toSet
    assert(canon(Temporal.scd2Merge(log, none)) == canon(Temporal.scd2Merge(none, log)),
      "degenerate splits disagree")
  }

  test("bucketed overlap join: parity with naive theta, no nested-loop in plan") {
    val iv = Temporal.sessionIntervals(Tables.events(spark, sf))
      .select(col("user_id"), unix_micros(col("s")).as("s_us"), unix_micros(col("e")).as("e_us"))
    val a = iv.select(col("user_id").as("u1"), col("s_us").as("s1"), col("e_us").as("e1"))
    val b = iv.select(col("user_id").as("u2"), col("s_us").as("s2"), col("e_us").as("e2"))
    val naive = a.join(b, col("u1") < col("u2") &&
        col("e1") >= col("s2") && col("e2") >= col("s1"))
      .withColumn("ov_start", greatest(col("s1"), col("s2")))
      .groupBy(from_unixtime(expr("ov_start div 1000000"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e1"), col("e2")) - col("ov_start")).as("overlap_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val bucketed = Temporal.jIntervalOverlap(spark, sf)
    val got = bucketed.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && got.toSeq == naive.toSeq,
      "bucketed overlap join diverges from the theta-join semantics")
    val ops = PlanTestUtils.flatten(bucketed.queryExecution.executedPlan)
    assert(!ops.exists(p => p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      p.isInstanceOf[CartesianProductExec]),
      "bucketed overlap join must meet through an equi-join, not a nested loop")
  }

  test("snapshot diff partitions the active keys and replays old → new") {
    // independent replay: rebuild both activity snapshots from the raw log
    // with a driver-side fold (a different dataflow from the engine's
    // max-struct aggregate + full-outer join)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect() // sf0.01: 10k rows, test-side only
    def snap(at: String): Map[Long, (String, Long)] = {
      val tUs = java.time.Instant.parse(at.replace(' ', 'T') + "Z")
        .toEpochMilli * 1000L
      ev.filter(r => r.getLong(1) <= tUs && r.getLong(1) > tUs - Temporal.SnapWindowUs)
        .groupBy(_.getLong(0))
        .map { case (u, rs) =>
          val last = rs.maxBy(r => (r.getLong(1), r.getLong(2)))
          u -> (last.getString(3), rs.length.toLong)
        }
    }
    val s1 = snap(Temporal.DiffT1)
    val s2 = snap(Temporal.DiffT2)
    val rows = Temporal.snSnapshotDiff(spark, sf).collect()
    // key space: every diff row is a key from either snapshot, exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(_.getLong(0)).toSet == (s1.keySet ++ s2.keySet))
    // all four classes must be live at this SF (the 1-day window exists
    // precisely so added/removed don't degenerate)
    val classes = rows.map(_.getString(1)).toSet
    assert(classes == Set("added", "removed", "changed", "unchanged"),
      s"expected all four diff classes, got $classes")
    // classification agrees with the independent snapshots, and applying
    // the diff to s1 reconstructs s2 (the CDC-faithfulness contract)
    val applied = scala.collection.mutable.Map.empty[Long, (String, Long)]
    s1.foreach { case (k, v) => applied(k) = v }
    rows.foreach { r =>
      val k = r.getLong(0)
      r.getString(1) match {
        case "added" =>
          assert(!s1.contains(k) && s2.contains(k), s"user $k misclassified")
          assert(r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(6))
          applied(k) = (r.getString(3), r.getLong(5))
        case "removed" =>
          assert(s1.contains(k) && !s2.contains(k), s"user $k misclassified")
          assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(6))
          applied.remove(k)
        case "changed" =>
          assert(s1(k) != s2(k), s"user $k not actually changed")
          assert(r.getLong(6) >= 1L && r.getLong(6) <= 2L)
          applied(k) = (r.getString(3), r.getLong(5))
        case "unchanged" =>
          assert(s1(k) == s2(k) && r.getLong(6) == 0L,
            s"user $k not actually unchanged")
      }
    }
    assert(applied.toMap == s2, "replaying the diff onto old must yield new")
  }
}
