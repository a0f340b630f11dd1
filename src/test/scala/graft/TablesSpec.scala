package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `events.ts` normalization contract in [[Tables.events]].
  *
  * The driver has regenerated /root/testdata under three different physical
  * parquet encodings for `ts` across rounds (INT64 TIMESTAMP(NANOS),
  * TIMESTAMP_MICROS isAdjustedToUTC=0 → TIMESTAMP_NTZ, TIMESTAMP_MICROS
  * isAdjustedToUTC=1 → TIMESTAMP). The r11 regen to NTZ silently broke
  * `j_asof_events` (unix_micros rejects NTZ) and StreamingSpec
  * (`Row.getTimestamp` CCE on LocalDateTime). This spec makes any future
  * encoding shift a loud, attributable failure instead.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)

  test("driver testdata events.ts always surfaces as TimestampType") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dt = Tables.events(spark, s"/root/testdata/$sf").schema("ts").dataType
      assert(dt == TimestampType, s"$sf events.ts surfaced as $dt")
    }
  }

  test("ts normalization covers all three physical encodings at one instant") {
    import spark.implicits._
    val micros = 1721995200123456L // 2024-07-26T12:00:00.123456Z
    val tmp = Files.createTempDirectory("graft-events-enc").toFile
    tmp.deleteOnExit()

    // Encoding A: nanos-as-Long (what the nanosAsLong session conf yields for
    // INT64 TIMESTAMP(NANOS) files). A plain Long `ts` column exercises the
    // identical LongType branch in Tables.events.
    val longDir = s"${tmp.getAbsolutePath}/long"
    Seq((1L, micros * 1000L)).toDF("event_id", "ts").write.parquet(longDir)

    // Encoding B: TIMESTAMP_NTZ (isAdjustedToUTC=0 micros — the r11 regen).
    val ntzDir = s"${tmp.getAbsolutePath}/ntz"
    Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.parquet(ntzDir)

    // Encoding C: TIMESTAMP (isAdjustedToUTC=1 micros).
    val tzDir = s"${tmp.getAbsolutePath}/tz"
    Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .write.parquet(tzDir)

    for (dir <- Seq(longDir, ntzDir, tzDir)) {
      val df = spark.read.parquet(s"$dir")
      // route through the same match Tables.events applies
      val normalized = df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
      assert(normalized.schema("ts").dataType == TimestampType, s"$dir not normalized")
      val got = normalized.select(unix_micros(col("ts"))).as[Long].head()
      assert(got == micros, s"$dir: instant drifted to $got (expected $micros)")
    }
  }

  test("Tables.events itself normalizes an NTZ-encoded file") {
    // end-to-end through Tables.events (not just the mirrored match): write an
    // events-shaped NTZ file and load it via a dir override
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-events-tbl").toFile
    tmp.deleteOnExit()
    Seq((1L, "click")).toDF("event_id", "event_type")
      .withColumn("ts", timestamp_micros(lit(1721995200000000L)).cast(TimestampNTZType))
      .write.parquet(s"${tmp.getAbsolutePath}/events.parquet")
    val dt = Tables.events(spark, tmp.getAbsolutePath).schema("ts").dataType
    assert(dt == TimestampType)
  }

  test("canary: every driver timestamp column surfaces as a timestamp family type") {
    // o_orderdate / l_shipdate ship as TIMESTAMP_NTZ today and every
    // consumer (and the DuckDB oracle) agrees on that under the UTC session;
    // what must NEVER happen silently is a regen flipping them to an
    // encoding that surfaces as a raw Long (the events.ts r11 failure mode —
    // Tables shims that case back to a timestamp). This fails loudly on any
    // NEW physical encoding instead of letting date functions break mid-query.
    val dir = "/root/testdata/sf0.001"
    val cols = Seq(
      Tables.events(spark, dir).schema("ts").dataType,
      Tables.orders(spark, dir).schema("o_orderdate").dataType,
      Tables.lineitem(spark, dir).schema("l_shipdate").dataType)
    cols.foreach { dt =>
      assert(dt == TimestampType || dt == TimestampNTZType,
        s"timestamp column surfaced as $dt — new physical encoding in testdata?")
    }
  }

  test("orders/lineitem nanos-Long shim converts without drifting the instant") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-orders-tbl").toFile
    tmp.deleteOnExit()
    val micros = 1721995200000000L
    Seq((1L, micros * 1000L)).toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"${tmp.getAbsolutePath}/orders.parquet")
    val o = Tables.orders(spark, tmp.getAbsolutePath)
    assert(o.schema("o_orderdate").dataType == TimestampType)
    assert(o.select(unix_micros(col("o_orderdate"))).as[Long].head() == micros)
  }
}
