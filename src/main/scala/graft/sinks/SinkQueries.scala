package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain.Fixtures

/** Oracle-checked queries for the merge sinks (S9/S10). */
object SinkQueries {

  /** Existing poi rows: (google_place_id, name, rating, reviews_count,
    * first_ingested_at). */
  val existingPoi: Seq[(String, String, Option[Double], Option[Int], String)] = Seq(
    ("g1", "Chez Panisse", Some(4.5), Some(200), "2024-01-01 00:00:00"),
    ("g2", "Old Bar", Some(4.0), Some(150), "2024-02-01 00:00:00"),
    ("g3", "Quiet Cafe", None, Some(30), "2024-03-01 00:00:00"))

  /** Incoming batch: g1 update (new rating), g2 partial update (null rating
    * keeps existing), g4 insert. */
  val incomingPoi: Seq[(String, String, Option[Double], Option[Int])] = Seq(
    ("g1", "Chez Panisse", Some(4.6), Some(230)),
    ("g2", "Old Bar Renamed", None, Some(160)),
    ("g4", "Brand New Spot", Some(4.9), Some(12)))

  private def existingDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    existingPoi.toDF("google_place_id", "name", "rating", "reviews_count", "first_ingested_at")
      .withColumn("first_ingested_at", to_timestamp(col("first_ingested_at")))
  }

  private def incomingDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // incoming rows have no first_ingested_at — the sink stamps inserts
    incomingPoi.toDF("google_place_id", "name", "rating", "reviews_count")
      .withColumn("first_ingested_at", lit(null).cast("timestamp"))
  }

  def qS9Upsert(spark: SparkSession, dir: String): DataFrame =
    MergeSink.upsert(existingDf(spark), incomingDf(spark), "google_place_id",
      updateCols = Seq("name", "rating", "reviews_count"), asOf = Fixtures.asOf)
      .select(col("google_place_id"), col("name"), col("rating"), col("reviews_count"),
        date_format(col("first_ingested_at"), "yyyy-MM-dd").as("first_ingested_date"))

  /** Incoming snapshots against Fixtures.snapshots: in1 suppressed (2d after
    * p1's latest 2025-05-30), in2 allowed (8d), in3 new poi always allowed,
    * in4 exactly 7d boundary allowed (>= interval). */
  val incomingSnapshots: Seq[(String, String, Double, Int, String)] = Seq(
    ("p1", "google", 4.8, 52, "2025-06-01 00:00:00"),
    ("p1", "google", 4.8, 55, "2025-06-07 00:00:00"),
    ("p9", "google", 4.1, 10, "2025-06-01 00:00:00"),
    ("p4", "google", 4.7, 124, "2025-06-05 00:00:00"))

  private def incomingSnapshotsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    incomingSnapshots.toDF("poi_id", "source_id", "rating_value", "reviews_count", "captured_at")
      .withColumn("captured_at", to_timestamp(col("captured_at")))
  }

  private def incomingSnapshotValues: String = incomingSnapshots.map {
    case (pid, sid, rv, rc, ca) =>
      s"('$pid', '$sid', CAST($rv AS DOUBLE), $rc, TIMESTAMP '$ca')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS inc(poi_id, source_id, rating_value, reviews_count, captured_at)"

  def qS10ConditionalAppend(spark: SparkSession, dir: String): DataFrame =
    MergeSink.conditionalAppend(
      graft.domain.Fixtures.snapshotsDf(spark), incomingSnapshotsDf(spark))
      .select(col("poi_id"), col("source_id"), col("rating_value"), col("reviews_count"),
        date_format(col("captured_at"), "yyyy-MM-dd").as("captured_date"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_upsert_poi" -> (qS9Upsert _),
    "s10_conditional_append" -> (qS10ConditionalAppend _))

  private def existingValues: String = existingPoi.map { case (g, n, r, rc, fi) =>
    val rs = r.map(v => s"CAST($v AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
    val rcs = rc.map(_.toString).getOrElse("CAST(NULL AS INTEGER)")
    s"('$g', '$n', $rs, $rcs, TIMESTAMP '$fi')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS e(google_place_id, name, rating, reviews_count, first_ingested_at)"

  private def incomingValues: String = incomingPoi.map { case (g, n, r, rc) =>
    val rs = r.map(v => s"CAST($v AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
    val rcs = rc.map(_.toString).getOrElse("CAST(NULL AS INTEGER)")
    s"('$g', '$n', $rs, $rcs)"
  }.mkString("(VALUES ", ", ", ")") +
    " AS i(google_place_id, name, rating, reviews_count)"

  val oracles: Map[String, String] = Map(
    "s9_upsert_poi" ->
      s"""SELECT coalesce(e.google_place_id, i.google_place_id) AS google_place_id,
         |  coalesce(i.name, e.name) AS name,
         |  coalesce(i.rating, e.rating) AS rating,
         |  coalesce(i.reviews_count, e.reviews_count) AS reviews_count,
         |  strftime(CASE WHEN e.google_place_id IS NULL
         |    THEN TIMESTAMP '${Fixtures.asOf}' ELSE e.first_ingested_at END,
         |    '%Y-%m-%d') AS first_ingested_date
         |FROM $existingValues
         |FULL OUTER JOIN $incomingValues
         |  ON e.google_place_id = i.google_place_id""".stripMargin,
    "s10_conditional_append" ->
      s"""SELECT inc.poi_id, inc.source_id, inc.rating_value, inc.reviews_count,
         |  strftime(inc.captured_at, '%Y-%m-%d') AS captured_date
         |FROM $incomingSnapshotValues
         |LEFT JOIN (SELECT poi_id, source_id, max(captured_at) AS latest_at
         |           FROM ${Fixtures.snapshotValues} GROUP BY poi_id, source_id) lat
         |  ON inc.poi_id = lat.poi_id AND inc.source_id = lat.source_id
         |WHERE lat.latest_at IS NULL
         |   OR date_diff('day', CAST(lat.latest_at AS DATE), CAST(inc.captured_at AS DATE)) >= 7""".stripMargin)
}
