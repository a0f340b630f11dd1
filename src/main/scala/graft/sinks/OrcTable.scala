package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** S21 — ORC roundtrip, the columnar-sibling coverage of [[JsonlTable]]'s
  * S13: write the documents corpus as ORC, read it back, and aggregate — the
  * oracle replays the aggregate over the parquet SOURCE, so the hash gate
  * spans the whole ORC encode/decode cycle. Where the JSONL probe stresses
  * text escaping and schema re-inference, ORC stresses the other encoder
  * family Spark ships natively: dictionary/RLE string encoding, typed schema
  * preservation (no inference — the read-back schema must BE the written
  * one), and stripe/footer statistics. The per-(lang, source) length sums
  * plus the distinct-id count are the sensitive probes: a lossy string
  * encoder, a dropped row, or a type downgrade moves at least one of them.
  * Scale: same repartition(4) shard layout as the JSONL export; ORC scans
  * support the same predicate-pushdown/column-pruning machinery as parquet,
  * so downstream consumers keep their plans. */
object OrcTable {

  /** Deterministic per-sf location (bench and verify must not clobber each
    * other's tables mid-run — same rule as [[PartitionedTable.tableDir]]). */
  def tableDir(dir: String): String =
    "spark-warehouse/s21_docs_" + new java.io.File(dir).getName

  def writeOrc(spark: SparkSession, dir: String): String = {
    val out = tableDir(dir)
    Tables.documents(spark, dir)
      .repartition(4)
      .write.mode("overwrite").orc(out)
    out
  }

  def qS21OrcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(writeOrc(spark, dir))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"),
        max(length(col("text"))).cast("long").as("max_text_len"),
        countDistinct(col("doc_id")).as("n_distinct_docs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s21_orc_roundtrip" -> (qS21OrcRoundtrip _))

  /** Replayed over the parquet SOURCE — the check spans the ORC write, shard
    * layout, schema preservation, and read-back. */
  val oracles: Map[String, String] = Map(
    "s21_orc_roundtrip" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_text_len,
        |  CAST(max(len(text)) AS BIGINT) AS max_text_len,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
        |FROM documents GROUP BY lang, source""".stripMargin)
}
