package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic testdata tables (TESTDATA.md).
  *
  * At cluster scale these would be partitioned/bucketed Delta tables; here they
  * are single parquet files per table. All loads are plain `spark.read.parquet`
  * so Catalyst's column pruning + predicate pushdown reach the scan.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame =
    shimNanosLong(load(spark, dir, "orders"), "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    shimNanosLong(load(spark, dir, "lineitem"), "l_shipdate")

  /** Defensive variant of the [[events]] normalization for the other
    * timestamp-bearing tables: `o_orderdate`/`l_shipdate` currently ship as
    * TIMESTAMP_MICROS `isAdjustedToUTC=0` (read as TIMESTAMP_NTZ, which every
    * consumer and the DuckDB oracle agree on under the UTC session), but the
    * regen that flipped `events.ts` to INT64 TIMESTAMP(NANOS) in r9-r11 could
    * do the same here — in which case `nanosAsLong` hands us a raw Long and
    * every date function downstream fails analysis. Convert that one encoding
    * back to a timestamp; leave the currently-green encodings untouched.
    * TablesSpec pins all three tables' timestamp columns as timestamp-family
    * so a new physical encoding fails loudly at the canary, not mid-query. */
  private def shimNanosLong(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$c div 1000")))
      case _ => df
    }
  /** `events.ts` has shipped under three physical parquet encodings across
    * testdata regenerations; normalize all of them to `TimestampType` so every
    * downstream operator sees one stable type:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[graft.Sessions]])
    *    it arrives as a nanosecond Long — convert with integer division
    *    (double division would lose precision past 2^53).
    *  - TIMESTAMP_MICROS `isAdjustedToUTC=0`: Spark 4 infers TIMESTAMP_NTZ —
    *    cast to TimestampType (a no-op instant shift under the UTC session).
    *  - TIMESTAMP_MICROS `isAdjustedToUTC=1`: already TimestampType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
