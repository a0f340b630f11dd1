package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** S13 — JSONL sink, driver-gated (previously "built-in `df.write.json`",
  * declared without its own hash row): write the documents corpus as
  * partitioned JSON-lines, read it back, and aggregate — the oracle replays
  * the aggregate over the parquet SOURCE, so the hash gate covers the whole
  * encode/decode cycle: JSON string escaping (quotes, control chars),
  * numeric fidelity, and schema re-inference. The per-(lang, source) sum of
  * text lengths is the sensitive probe: any lossy escape or truncation in
  * the writer/reader pair moves it. */
object JsonlTable {

  /** Deterministic per-sf location (bench and verify must not clobber each
    * other's tables mid-run — same rule as [[PartitionedTable.tableDir]]). */
  def tableDir(dir: String): String =
    "spark-warehouse/s13_docs_" + new java.io.File(dir).getName

  def writeJsonl(spark: SparkSession, dir: String): String = {
    val out = tableDir(dir)
    Tables.documents(spark, dir)
      .repartition(4) // a handful of shard files, like a real JSONL export
      .write.mode("overwrite").json(out)
    out
  }

  def qS13JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(writeJsonl(spark, dir))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s13_jsonl_roundtrip" -> (qS13JsonlRoundtrip _))

  /** Replayed over the parquet SOURCE — so the check spans the JSONL write,
    * shard layout, schema re-inference, and read-back. */
  val oracles: Map[String, String] = Map(
    "s13_jsonl_roundtrip" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY lang, source""".stripMargin)
}
