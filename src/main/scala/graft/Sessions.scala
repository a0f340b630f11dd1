package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for Verify/Bench/tests.
  *
  * Centralizes the settings that matter for oracle parity and local-mode
  * throughput; on a real cluster the same settings hold (AQE, broadcast
  * thresholds), with shuffle partitions sized to the cluster instead.
  */
object Sessions {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    // same injection as spark.sql.extensions=graft.GraftExtensions at
    // cluster startup: SQL functions + the spatial cell-join rewrite —
    // applied here so Verify, Bench and every test session run through the
    // exact extension set a deployed cluster would
    .withExtensions(new GraftExtensions())
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // testdata events.ts is TIMESTAMP(NANOS); read as Long, converted in Tables
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the generated-class cache (STATIC conf) defaults to 100 entries; the
    // declared query surface is >125 plans, so Verify and the interleaved
    // Bench rounds would otherwise thrash it and re-Janino-compile every
    // query each pass (~40% uniform inflation measured at sf0.1)
    .config("spark.sql.codegen.cache.maxEntries", "2000")

  /** Session for ScalaTest suites. */
  def local(cores: Int = 4): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores.toString)
      .getOrCreate()
}
