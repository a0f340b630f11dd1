package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Domain dataflows at sf-scale VOLUME (VERDICT r1 item 3): the classify and
  * mention-scoring trees are hash-proven on 8-row fixtures; these variants run
  * the SAME operators over poi/mention/snapshot/candidate tables derived
  * deterministically from the TPC-H `customer`/`orders` parquet — thousands of
  * POIs, ~10 mentions/snapshots each at sf0.01 — so the dataflows are
  * exercised (and benched) at data volume with a full DuckDB oracle.
  *
  * Both engines derive the tables with the IDENTICAL arithmetic (integer
  * modulus → CAST AS DOUBLE → division), so every value — including NULL
  * injection and timestamps — agrees bit-for-bit. `captured_at` gets a
  * per-order second offset; ties are impossible to observe because
  * `reviews_count` is a function of the same offset (equal timestamps imply
  * equal payloads, making DuckDB's arg_max tie-break irrelevant).
  */
object VolumeFixtures {

  /** TPC-H's last order date — the deterministic "now" for volume variants. */
  val asOfVol = "1998-08-02 00:00:00"

  // ------------------------------------------------------------ Spark side

  def poiVol(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").cast("string").as("id"),
      col("c_name").as("name"),
      when(col("c_custkey") % 5 === 0, "cafe")
        .when(col("c_custkey") % 5 === 1, "restaurant")
        .when(col("c_custkey") % 5 === 2, "bar")
        .when(col("c_custkey") % 5 === 3, "bakery")
        .otherwise("night_club").as("category"),
      concat(lit("city_"), col("c_nationkey").cast("string")).as("city"),
      when(col("c_custkey") % 23 === 0, lit(null).cast("double"))
        .otherwise((col("c_custkey") % 20).cast("double") / 10.0 + 3.0).as("rating"),
      (col("c_custkey") % 2000).as("reviews_count"),
      when(col("c_custkey") % 29 === 0, lit(null).cast("timestamp"))
        .otherwise(date_sub(lit("1998-08-02").cast("date"),
          (col("c_custkey") % 500).cast("int")).cast("timestamp")).as("first_seen_at"),
      when(col("c_custkey") % 3 === 0, "hold")
        .when(col("c_custkey") % 3 === 1, "eligible")
        .otherwise("approved").as("eligibility_status"))

  def mentionsVol(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_custkey").cast("string").as("poi_id"),
      when(col("o_orderkey") % 5 === 0, "guide")
        .when(col("o_orderkey") % 5 === 1, "press")
        .when(col("o_orderkey") % 5 === 2, "local")
        .when(col("o_orderkey") % 5 === 3, "blog")
        .otherwise("tv").as("source_type"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 11).cast("double") / 10.0).as("authority_weight"),
      when(col("o_orderkey") % 17 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 101).cast("double") / 100.0).as("match_score"),
      when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 100).cast("double") / 100.0).as("w_time"),
      when(col("o_orderkey") % 19 === 0, lit(null).cast("timestamp"))
        .otherwise(col("o_orderdate")).as("created_at"))

  def snapshotsVol(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_custkey").cast("string").as("poi_id"),
      lit("google").as("source_id"),
      ((col("o_orderkey") % 21).cast("double") / 10.0 + 2.9).as("rating_value"),
      ((col("o_orderkey") % 86400) % 1000).as("reviews_count"),
      expr("timestampadd(SECOND, CAST(o_orderkey % 86400 AS INT), o_orderdate)").as("captured_at"))

  def candsVol(spark: SparkSession, dir: String): DataFrame = {
    val dom = when(col("o_orderkey") % 6 === 0, "lefooding.com")
      .when(col("o_orderkey") % 6 === 1, "unknown-blog.net")
      .when(col("o_orderkey") % 6 === 2, "guide.michelin.com")
      .when(col("o_orderkey") % 6 === 3, "instagram.com")
      .when(col("o_orderkey") % 6 === 4, "parisbouge.com")
      .otherwise("random-site.org")
    Tables.fanOut(Tables.orders(spark, dir), col("o_orderkey")).select(
      col("o_orderkey").cast("string").as("cand_id"),
      col("o_custkey").cast("string").as("poi_id"),
      (lit(48.0) + (col("o_orderkey") % 200).cast("double") / 100.0).as("poi_lat"),
      (lit(2.0) + (col("o_orderkey") % 70).cast("double") / 100.0).as("poi_lng"),
      concat(lit("review "), lower(col("o_orderpriority")),
        when(col("o_orderkey") % 7 === 0, lit(" paris")).otherwise(lit(""))).as("title"),
      when(col("o_orderkey") % 11 === 0, "the best spot in france 75001")
        .when(col("o_orderkey") % 11 === 5, "a long story about germany")
        .otherwise("nothing special here").as("snippet"),
      dom.as("domain"),
      concat(lit("https://"), dom,
        when(col("o_orderkey") % 9 === 0, lit("/paris/")).otherwise(lit("/x/")),
        col("o_orderkey").cast("string")).as("url"),
      ((col("o_orderkey") % 101).cast("double") / 100.0).as("name_match"))
  }

  // ----------------------------------------------------------- oracle SQL

  private val poiSql =
    """(SELECT CAST(c_custkey AS VARCHAR) AS id,
      |   c_name AS name,
      |   CASE c_custkey % 5 WHEN 0 THEN 'cafe' WHEN 1 THEN 'restaurant'
      |     WHEN 2 THEN 'bar' WHEN 3 THEN 'bakery' ELSE 'night_club' END AS category,
      |   'city_' || CAST(c_nationkey AS VARCHAR) AS city,
      |   CASE WHEN c_custkey % 23 = 0 THEN NULL
      |     ELSE CAST(c_custkey % 20 AS DOUBLE) / 10.0 + 3.0 END AS rating,
      |   c_custkey % 2000 AS reviews_count,
      |   CASE WHEN c_custkey % 29 = 0 THEN NULL
      |     ELSE CAST(DATE '1998-08-02' - CAST(c_custkey % 500 AS INTEGER) AS TIMESTAMP) END AS first_seen_at,
      |   CASE c_custkey % 3 WHEN 0 THEN 'hold' WHEN 1 THEN 'eligible'
      |     ELSE 'approved' END AS eligibility_status
      | FROM customer) AS poi""".stripMargin

  private val mentionSql =
    """(SELECT CAST(o_custkey AS VARCHAR) AS poi_id,
      |   CASE o_orderkey % 5 WHEN 0 THEN 'guide' WHEN 1 THEN 'press'
      |     WHEN 2 THEN 'local' WHEN 3 THEN 'blog' ELSE 'tv' END AS source_type,
      |   CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |     ELSE CAST(o_orderkey % 11 AS DOUBLE) / 10.0 END AS authority_weight,
      |   CASE WHEN o_orderkey % 17 = 0 THEN NULL
      |     ELSE CAST(o_orderkey % 101 AS DOUBLE) / 100.0 END AS match_score,
      |   CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |     ELSE CAST(o_orderkey % 100 AS DOUBLE) / 100.0 END AS w_time,
      |   CASE WHEN o_orderkey % 19 = 0 THEN NULL ELSE o_orderdate END AS created_at
      | FROM orders) AS m""".stripMargin

  private val snapshotSql =
    """(SELECT CAST(o_custkey AS VARCHAR) AS poi_id,
      |   'google' AS source_id,
      |   CAST(o_orderkey % 21 AS DOUBLE) / 10.0 + 2.9 AS rating_value,
      |   (o_orderkey % 86400) % 1000 AS reviews_count,
      |   o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS captured_at
      | FROM orders) AS s""".stripMargin

  private val candSql =
    """(SELECT CAST(o_orderkey AS VARCHAR) AS cand_id,
      |   CAST(o_custkey AS VARCHAR) AS poi_id,
      |   48.0 + CAST(o_orderkey % 200 AS DOUBLE) / 100.0 AS poi_lat,
      |   2.0 + CAST(o_orderkey % 70 AS DOUBLE) / 100.0 AS poi_lng,
      |   'review ' || lower(o_orderpriority) ||
      |     CASE WHEN o_orderkey % 7 = 0 THEN ' paris' ELSE '' END AS title,
      |   CASE WHEN o_orderkey % 11 = 0 THEN 'the best spot in france 75001'
      |     WHEN o_orderkey % 11 = 5 THEN 'a long story about germany'
      |     ELSE 'nothing special here' END AS snippet,
      |   CASE o_orderkey % 6 WHEN 0 THEN 'lefooding.com' WHEN 1 THEN 'unknown-blog.net'
      |     WHEN 2 THEN 'guide.michelin.com' WHEN 3 THEN 'instagram.com'
      |     WHEN 4 THEN 'parisbouge.com' ELSE 'random-site.org' END AS domain,
      |   'https://' ||
      |     CASE o_orderkey % 6 WHEN 0 THEN 'lefooding.com' WHEN 1 THEN 'unknown-blog.net'
      |          WHEN 2 THEN 'guide.michelin.com' WHEN 3 THEN 'instagram.com'
      |          WHEN 4 THEN 'parisbouge.com' ELSE 'random-site.org' END ||
      |     CASE WHEN o_orderkey % 9 = 0 THEN '/paris/' ELSE '/x/' END ||
      |     CAST(o_orderkey AS VARCHAR) AS url,
      |   CAST(o_orderkey % 101 AS DOUBLE) / 100.0 AS name_match
      | FROM orders) AS cand""".stripMargin

  // ------------------------------------------------------- declared queries

  def qClassifyScoresVol(spark: SparkSession, dir: String): DataFrame =
    Classify.scores(poiVol(spark, dir), mentionsVol(spark, dir),
      snapshotsVol(spark, dir), asOfVol).drop("name")

  def qClassifyCityStatsVol(spark: SparkSession, dir: String): DataFrame =
    Classify.cityStats(qClassifyScoresVol(spark, dir))

  def qMentionDecisionVol(spark: SparkSession, dir: String): DataFrame =
    MentionScoring.scoreAndDecide(candsVol(spark, dir), spark)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "classify_scores_vol" -> (qClassifyScoresVol _),
    "classify_city_stats_vol" -> (qClassifyCityStatsVol _),
    "mention_score_decision_vol" -> (qMentionDecisionVol _))

  private def scoredVolSql: String =
    Classify.scoredSqlFrom(poiSql, mentionSql, snapshotSql, asOfVol)

  val oracles: Map[String, String] = Map(
    "classify_scores_vol" -> scoredVolSql,
    "classify_city_stats_vol" ->
      s"""SELECT city, count(*) AS n_pois,
         |  round(quantile_cont(gatto_score, 0.5), 6) AS p50_gatto,
         |  round(quantile_cont(gatto_score, 0.95), 6) AS p95_gatto
         |FROM ($scoredVolSql) GROUP BY city""".stripMargin,
    "mention_score_decision_vol" ->
      MentionScoring.oracleSqlDecisionImpl(false, candSql))
}
