package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's declared operator queries; `oracleSql`
  * carries the DuckDB-equivalent SQL for the hash compare. Column names/aliases
  * must match between the two (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Every module's (queries, oracles) pair. Public so ContractSpec can derive
    * its per-module sums from the same list the merge uses — a new module
    * registered here is automatically covered by the uniqueness check. */
  def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (ops.Relational.queries, ops.Relational.oracles),
    (ops.Windows.queries, ops.Windows.oracles),
    (ops.SetOps.queries, ops.SetOps.oracles),
    (ops.Joins.queries, ops.Joins.oracles),
    (ops.Scalars.queries, ops.Scalars.oracles),
    (ops.TextDedup.queries, ops.TextDedup.oracles),
    (ops.TextAnalysis.queries, ops.TextAnalysis.oracles),
    (ops.CorpusOps.queries, ops.CorpusOps.oracles),
    (ops.Similarity.queries, ops.Similarity.oracles),
    (ops.Multimodal.queries, ops.Multimodal.oracles),
    (domain.Classify.queries, domain.Classify.oracles),
    (domain.VolumeFixtures.queries, domain.VolumeFixtures.oracles),
    (domain.PipelineVol.queries, domain.PipelineVol.oracles),
    (domain.DateEnrichment.queries, domain.DateEnrichment.oracles),
    (domain.MentionScoring.queries, domain.MentionScoring.oracles),
    (domain.MentionDedup.queries, domain.MentionDedup.oracles),
    (domain.Spatial.queries, domain.Spatial.oracles),
    (domain.Ingest.queries, domain.Ingest.oracles),
    (domain.Collections.queries, domain.Collections.oracles),
    (sources.BucketedTables.queries, sources.BucketedTables.oracles),
    (sinks.SinkQueries.queries, sinks.SinkQueries.oracles),
    (sinks.PartitionedTable.queries, sinks.PartitionedTable.oracles),
    (sinks.ScriptSinks.queries, sinks.ScriptSinks.oracles),
    (streaming.FsmQueries.queries, streaming.FsmQueries.oracles),
    (streaming.Streams.queries, streaming.Streams.oracles),
    (domain.Trending.queries, domain.Trending.oracles),
    (domain.Monitoring.queries, domain.Monitoring.oracles),
    (ops.SerpCache.queries, ops.SerpCache.oracles),
    (ops.Temporal.queries, ops.Temporal.oracles),
    (sinks.ZorderLayout.queries, sinks.ZorderLayout.oracles),
    (ops.Sketches.queries, ops.Sketches.oracles),
    (sinks.JsonlTable.queries, sinks.JsonlTable.oracles),
    (sinks.OrcTable.queries, sinks.OrcTable.oracles),
    (sinks.TargetedDelete.queries, sinks.TargetedDelete.oracles),
    (sinks.StatsRead.queries, sinks.StatsRead.oracles),
    (sinks.CompositeKey.queries, sinks.CompositeKey.oracles),
    (sinks.MultiCommit.queries, sinks.MultiCommit.oracles),
    (sinks.CdcApply.queries, sinks.CdcApply.oracles),
    (sinks.Compaction.queries, sinks.Compaction.oracles),
    (sinks.Maintenance.queries, sinks.Maintenance.oracles),
    (sinks.Expectations.queries, sinks.Expectations.oracles),
    (ops.Quality.queries, ops.Quality.oracles),
    (ops.Retrieval.queries, ops.Retrieval.oracles),
    (ops.Graph.queries, ops.Graph.oracles),
    (ops.H3Native.queries, ops.H3Native.oracles),
    (streaming.QuotaBucket.queries, streaming.QuotaBucket.oracles),
    (sources.SchemaEvolution.queries, sources.SchemaEvolution.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
