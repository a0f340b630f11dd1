package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain._

/** Stage orchestrator (SURVEY §3.1; replaces run_pipeline.py's subprocess
  * chain). One SparkSession, stages chained as DataFrames — the inter-stage
  * contract is typed data, not parsed stdout. Each stage is the library
  * operator; this object only wires them.
  *
  * A12 run counters ride on `observe()` metrics (the Spark-native substitute
  * for the reference's RunSummary logger, logging_ext.py:14-86).
  */
object Pipeline {

  case class RunResult(
    ingested: DataFrame,
    spatial: DataFrame,
    mentions: DataFrame,
    scored: DataFrame,
    collections: DataFrame,
    trendLog: DataFrame)

  def run(spark: SparkSession, asOf: String = Fixtures.asOf): RunResult = {
    // INGEST: search results → poi rows (P1–P5) with run counters observed
    val ingested = Ingest.toPoiRows(Ingest.placesDf(spark))
      .observe("ingest", count(lit(1)).as("n_poi_rows"),
        count(when(col("passes_quality_gate"), 1)).as("n_quality_pass"))

    // SPATIAL: district/neighbourhood assignment (J1)
    val spatial = Spatial.assign(
      ingested.select(col("google_place_id").as("poi_id"), col("lat"), col("lng")),
      Spatial.areasDf(spark), spark)

    // MENTIONS: dedup (W4) → score + decide (§2.8) → accepted only
    val cands = MentionDedup.inBatchDedup(
      Fixtures.serpCandidatesDf(spark).withColumn("ord", monotonically_increasing_id()))
      .drop("norm_url", "norm_title", "ord")
    val decisions = MentionScoring.scoreAndDecide(cands, spark)
      .observe("mentions", count(lit(1)).as("n_scored"),
        count(when(col("decision") === "ACCEPT", 1)).as("n_accepted"),
        count(when(col("decision") === "REJECT", 1)).as("n_rejected"))
    val accepted = decisions.filter(col("decision").isin("ACCEPT", "REVIEW"))

    // CLASSIFY: A1–A7 over poi/mentions/snapshots
    val scored = Classify.scores(Fixtures.poiDf(spark), Fixtures.mentionsDf(spark),
      Fixtures.snapshotsDf(spark), asOf)

    // COLLECTIONS: template generation over tagged pois
    val collections = Collections.generate(
      Collections.taggedPoisDf(spark), Collections.templatesDf(spark))

    // TRENDING: discovery extraction + log
    val trendLog = Trending.discoveryLog(
      Trending.extractPoiNames(Trending.trendCandidatesDf(spark)))

    RunResult(ingested, spatial, accepted, scored, collections, trendLog)
  }
}
