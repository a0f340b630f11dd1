package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Relational

/** S20 — SCHEMA-EVOLUTION reads (beyond-reference lakehouse op).
  *
  * A table written over months accumulates files under different schema
  * epochs: columns appear, and occasionally a column is renamed. At 100 TB
  * nobody rewrites history — the READER reconciles. Parquet + Spark give
  * the additive half for free (`mergeSchema` unions file footers; rows from
  * old files surface the new columns as null); renames need an explicit
  * mapping because a footer union would just carry both spellings as
  * unrelated columns.
  *
  * This module proves both halves end to end on real written files, the
  * same write-then-read discipline as S16/S17/S18: epoch-1 files carry the
  * OLD shape (amount under its old name `val_amount`, no `channel`),
  * epoch-2 files the new one; [[readEvolved]] is the reconciling reader —
  * `mergeSchema` scan, rename map folded as coalesce, additive columns
  * defaulted. The declared oracle recomputes the aggregate from the SOURCE
  * table, so the hash gate proves write → evolve → reconcile → aggregate
  * loses nothing.
  *
  * Scale notes: `mergeSchema` costs one footer read per FILE at planning —
  * on a 100 TB table you bound it the standard way (schema from the table
  * catalog or `spark.read.schema(...)` pinned, with per-epoch mapping
  * applied the same way as here); the reconciling select is pure per-row
  * projection, codegen'd, and the epoch partition column prunes any
  * epoch-scoped read.
  */
object SchemaEvolution {

  def tableDir(dir: String): String =
    "spark-warehouse/s20_evolved_" + new java.io.File(dir).getName

  /** Epoch-2's derived column — the "new field backfilled only forward". */
  private def channelExpr = when(col("value") >= 100.0, "high").otherwise("std")

  /** Write the two schema epochs under one table root (epoch = partition
    * directory, so discovery yields it as a column and epoch-scoped reads
    * prune). Overwrite-idempotent per the bench contract. */
  def writeEvolved(spark: SparkSession, dir: String): String = {
    val out = tableDir(dir)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").as("val_amount")) // the old spelling, no channel column
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), channelExpr.as("channel"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    out
  }

  /** The reconciling reader: one merged-footer scan; renames folded via
    * coalesce (exactly one spelling is non-null per file epoch); additive
    * columns defaulted explicitly so downstream never branches on epoch. */
  def readEvolved(spark: SparkSession, path: String,
      renames: Map[String, String] = Map("val_amount" -> "value")): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(path)
    val renamed = renames.foldLeft(raw) { case (df, (oldName, newName)) =>
      df.withColumn(newName, coalesce(col(newName), col(oldName))).drop(oldName)
    }
    renamed.withColumn("channel", coalesce(col("channel"), lit("unknown")))
  }

  def qS20SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val path = writeEvolved(spark, dir)
    readEvolved(spark, path)
      .groupBy(col("event_type"), col("epoch"), col("channel"))
      .agg(count(lit(1)).as("n_events"),
        Relational.centsSum(col("value"), 2).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("event_type"), col("epoch").cast("long").as("epoch"),
        col("channel"), col("n_events"), col("sum_value"), col("n_users"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "s20_schema_evolution" -> (qS20SchemaEvolution _))

  /** Oracle: the same epochs/renames/defaults recomputed from the SOURCE
    * table — proving the written files and the reconciling reader preserve
    * every row and value. */
  val oracles: Map[String, String] = Map(
    "s20_schema_evolution" ->
      s"""SELECT event_type,
         |  CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS epoch,
         |  CASE WHEN event_id % 2 = 0 THEN 'unknown'
         |       WHEN value >= 100.0 THEN 'high' ELSE 'std' END AS channel,
         |  count(*) AS n_events,
         |  ${Relational.centsSumSql("value", 2)} AS sum_value,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events GROUP BY 1, 2, 3""".stripMargin)
}
