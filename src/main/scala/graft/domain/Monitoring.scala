package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monitoring & quota operators (SURVEY §1.2 api_usage / monitoring_reports;
  * §2.9 daily quota buckets; reference: utils/api_usage.py:14-46,
  * monitoring_system.py:79-158, google_places_ingester.py:44-74).
  */
object Monitoring {

  /** Daily quota ledger: per (date, api_type) usage counts with a running
    * within-day sequence and the over-limit gate — the reference's
    * upsert-increment + daily token bucket, as one window + aggregate. The
    * events table stands in for the API-call log (event_type = api_type). */
  def qApiUsage(spark: SparkSession, dir: String): DataFrame = {
    val dailyLimit = 95 // CSE alert threshold (monitoring_system.py:61-63)
    graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("usage_date"), col("event_type").as("api_type"))
      .agg(count(lit(1)).as("queries_count"))
      .withColumn("daily_limit", lit(dailyLimit).cast("long"))
      .withColumn("over_limit", col("queries_count") > dailyLimit)
      .withColumn("usage_date", date_format(col("usage_date"), "yyyy-MM-dd"))
  }

  /** Monitoring report (monitoring_system.py:132-158): per city — trending
    * POIs (badge), new entrants, significant status changes, summary stats —
    * over the classifier output. */
  def report(scored: DataFrame): DataFrame =
    scored.groupBy(col("city")).agg(
      concat_ws("|", array_sort(collect_list(when(col("badge_trending"), col("id")))))
        .as("trending_pois"),
      concat_ws("|", array_sort(collect_list(when(col("badge_new"), col("id")))))
        .as("new_entrants"),
      concat_ws("|", array_sort(collect_list(
        when(col("eligibility_status_new") =!= col("eligibility_status_old"), col("id")))))
        .as("significant_changes"),
      count(lit(1)).as("n_pois"),
      round(avg(col("gatto_score")), 6).as("avg_gatto"),
      round(max(col("gatto_score")), 6).as("max_gatto"))

  def qMonitoringReport(spark: SparkSession, dir: String): DataFrame =
    report(Classify.qClassifyScores(spark, dir))

  /** SEO page materialization (§1.2 seo_pages; collection_generator.py:
    * 1035-1137): slug + canonical JSON-LD-ish structured data string. The
    * JSON is assembled with concat on BOTH engines (identical key order) so
    * the materialized string is hash-comparable. */
  def qSeoPages(spark: SparkSession, dir: String): DataFrame = {
    val members = Collections.generate(
      Collections.taggedPoisDf(spark), Collections.templatesDf(spark))
    members.groupBy(col("collection_id")).agg(
      count(lit(1)).as("n_members"),
      concat_ws(",", array_sort(collect_list(col("poi_id")))).as("member_ids"))
      .select(
        col("collection_id"),
        regexp_replace(lower(col("collection_id")), "[^a-z0-9]+", "-").as("slug"),
        col("n_members"),
        concat(lit("{\"@type\":\"ItemList\",\"name\":\""), col("collection_id"),
          lit("\",\"numberOfItems\":"), col("n_members"),
          lit(",\"members\":\""), col("member_ids"), lit("\"}")).as("structured_data"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a9_api_usage" -> (qApiUsage _),
    "mon_report" -> (qMonitoringReport _),
    "seo_pages" -> (qSeoPages _))

  val oracles: Map[String, String] = Map(
    "a9_api_usage" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS usage_date,
        |  event_type AS api_type, count(*) AS queries_count,
        |  CAST(95 AS BIGINT) AS daily_limit, count(*) > 95 AS over_limit
        |FROM events GROUP BY usage_date, api_type""".stripMargin,
    "mon_report" ->
      s"""SELECT city,
         |  coalesce(array_to_string(list_sort(list(id) FILTER (WHERE badge_trending)), '|'), '') AS trending_pois,
         |  coalesce(array_to_string(list_sort(list(id) FILTER (WHERE badge_new)), '|'), '') AS new_entrants,
         |  coalesce(array_to_string(list_sort(list(id)
         |    FILTER (WHERE eligibility_status_new != eligibility_status_old)), '|'), '') AS significant_changes,
         |  count(*) AS n_pois,
         |  CAST(round(avg(gatto_score), 6) AS DOUBLE) AS avg_gatto,
         |  CAST(round(max(gatto_score), 6) AS DOUBLE) AS max_gatto
         |FROM (${Classify.scoredSql}) GROUP BY city""".stripMargin,
    "seo_pages" -> {
      // reuse the p7 oracle as a CTE: DuckDB replays the same membership
      val p7 = Collections.oracles("p7_collections")
      s"""SELECT collection_id,
         |  regexp_replace(lower(collection_id), '[^a-z0-9]+', '-', 'g') AS slug,
         |  n_members,
         |  '{"@type":"ItemList","name":"' || collection_id ||
         |    '","numberOfItems":' || n_members ||
         |    ',"members":"' || member_ids || '"}' AS structured_data
         |FROM (SELECT collection_id, count(*) AS n_members,
         |        array_to_string(list_sort(list(poi_id)), ',') AS member_ids
         |      FROM ($p7) GROUP BY collection_id)""".stripMargin
    })
}
