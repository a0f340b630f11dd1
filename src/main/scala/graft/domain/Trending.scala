package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trending-discovery stage (SURVEY §2 TRENDING + §2.10 generator surface;
  * reference: scanner.py:473-730 — templated trend queries → POI-name
  * extraction from SERP text → stopword cleanup → distinct → discovery log
  * with novelty-boosted validation feeding the ingest stage).
  *
  * The extraction is a generator (UDTF-shape): one candidate row explodes into
  * 0..n extracted names via `regexp_extract_all` + `explode` — fully codegen'd,
  * no Python-style row loop.
  */
object Trending {

  /** (cand_id, query_text, title, snippet): quoted-name hits, capitalized
    * Restaurant/Bar/Café patterns, blocklisted words, too-short/too-long. */
  val trendCandidates: Seq[(String, String, String, String)] = Seq(
    ("tc1", "nouveau restaurant paris 2025",
      "On adore le \"restaurant Mimosa\" dans le Marais",
      "le \"bistrot Chez Louise\" aussi"),
    ("tc2", "trending bars paris",
      "Bar Central opened last week", "everyone talks about Le Mary Celeste Bar"),
    ("tc3", "best guide paris",
      "\"Top Paris restaurant guide\"", "the best list of places"),
    ("tc4", "cafe trends",
      "Café Oberkampf is packed", "a tiny \"cafe A\" too"))

  def trendCandidatesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    trendCandidates.toDF("cand_id", "query_text", "title", "snippet")
  }

  def trendCandidateValues: String = trendCandidates.map { case (c, q, t, s) =>
    def esc(x: String) = x.replace("'", "''")
    s"('${esc(c)}', '${esc(q)}', '${esc(t)}', '${esc(s)}')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS tc(cand_id, query_text, title, snippet)"

  /** Quoted-name pattern (scanner.py:570): venue word inside double quotes. */
  val quotedPattern = "\"([^\"]*(?:restaurant|bar|café|cafe|bistrot|brasserie)[^\"]*)\""

  /** Extraction: quoted names (case-insensitive venue word), length gate
    * (4..49 after trim), blocklist cleanup, distinct per query
    * (scanner.py:557-599 — pattern 1; capitalization patterns share the same
    * explode shape). */
  def extractPoiNames(cands: DataFrame): DataFrame = {
    val combined = concat_ws(" ", col("title"), col("snippet"))
    val blocked = Seq("paris", "france", "guide", "list", "top", "best")
    val blockedPred = blocked.map(w => lower(col("poi_name")).contains(w)).reduce(_ || _)
    cands
      .select(col("cand_id"), col("query_text"),
        explode(expr(s"regexp_extract_all($q, '(?i)$quotedPattern', 1)")).as("raw_name"))
      .withColumn("poi_name", trim(col("raw_name")))
      .filter(length(col("poi_name")) > 3 && length(col("poi_name")) < 50)
      .filter(!blockedPred)
      .select(col("query_text"), col("poi_name"))
      .distinct()
  }

  private val q = "concat_ws(' ', title, snippet)"

  /** Trend-discovery log aggregate (scanner.py:601-613): per query, the
    * extracted-name list (sorted for determinism) + count. */
  def discoveryLog(extracted: DataFrame): DataFrame =
    extracted.groupBy(col("query_text"))
      .agg(
        concat_ws("|", array_sort(collect_list(col("poi_name")))).as("poi_names_extracted"),
        count(lit(1)).as("results_count"))

  /** Validation + feedback (scanner.py:615-730 SYNERGIE): each discovered
    * name is looked up against the poi table (J3 containment: poi name
    * contains the discovered name, first match by id), and names absent from
    * the db get the novelty boost routed to ingest
    * (absent-in-db novelty feature, h3_scheduler.py:649-660). */
  def validateDiscovered(extracted: DataFrame, pois: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = extracted.join(
      broadcast(pois.select(col("id").as("matched_poi_id"), col("name").as("poi_table_name"))),
      lower(col("poi_table_name")).contains(lower(col("poi_name"))), "left")
    val w = Window.partitionBy(col("query_text"), col("poi_name"))
      .orderBy(coalesce(col("matched_poi_id"), lit("zzzz")).asc)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_text"), col("poi_name"),
        col("matched_poi_id"),
        col("matched_poi_id").isNotNull.as("exists_in_db"),
        when(col("matched_poi_id").isNull, 0.3).otherwise(0.0).as("novelty_boost"))
  }

  def qTrendValidation(spark: SparkSession, dir: String): DataFrame =
    validateDiscovered(extractPoiNames(trendCandidatesDf(spark)), Fixtures.poiDf(spark))

  def qTrendExtraction(spark: SparkSession, dir: String): DataFrame =
    extractPoiNames(trendCandidatesDf(spark))

  def qTrendLog(spark: SparkSession, dir: String): DataFrame =
    discoveryLog(extractPoiNames(trendCandidatesDf(spark)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tr_poi_extraction" -> (qTrendExtraction _),
    "tr_poi_extraction_vol" -> (qTrendExtractionVol _),
    "tr_discovery_log" -> (qTrendLog _),
    "tr_validation" -> (qTrendValidation _))

  /** SERP-shaped candidates derived from `orders` (identical formulas both
    * engines) — runs the extraction GENERATOR at data volume: tens of
    * thousands of rows explode through the same regex/blocklist/distinct. */
  def trendCandsVol(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.fanOut(graft.Tables.orders(spark, dir), col("o_orderkey")).select(
      col("o_orderkey").cast("string").as("cand_id"),
      concat(lit("trend q"), (col("o_custkey") % 20).cast("string")).as("query_text"),
      when(col("o_orderkey") % 3 === 0,
        concat(lit("on adore le \"restaurant "), col("o_custkey").cast("string"), lit("\" ici")))
        .when(col("o_orderkey") % 3 === 1, "nothing quoted here")
        .otherwise(concat(lit("le \"bar "), (col("o_orderkey") % 1000).cast("string"), lit("\" est top")))
        .as("title"),
      when(col("o_orderkey") % 5 === 0,
        concat(lit("aussi le \"bistrot "), (col("o_custkey") % 97).cast("string"), lit("\"")))
        .otherwise("rien de plus").as("snippet"))

  def qTrendExtractionVol(spark: SparkSession, dir: String): DataFrame =
    extractPoiNames(trendCandsVol(spark, dir))

  private val trendCandsVolSql =
    """(SELECT CAST(o_orderkey AS VARCHAR) AS cand_id,
      |   'trend q' || CAST(o_custkey % 20 AS VARCHAR) AS query_text,
      |   CASE WHEN o_orderkey % 3 = 0
      |          THEN 'on adore le "restaurant ' || CAST(o_custkey AS VARCHAR) || '" ici'
      |        WHEN o_orderkey % 3 = 1 THEN 'nothing quoted here'
      |        ELSE 'le "bar ' || CAST(o_orderkey % 1000 AS VARCHAR) || '" est top' END AS title,
      |   CASE WHEN o_orderkey % 5 = 0
      |          THEN 'aussi le "bistrot ' || CAST(o_custkey % 97 AS VARCHAR) || '"'
      |        ELSE 'rien de plus' END AS snippet
      | FROM orders) AS tc""".stripMargin

  val oracles: Map[String, String] = {
    val blocked = Seq("paris", "france", "guide", "list", "top", "best")
      .map(w => s"NOT contains(lower(poi_name), '$w')").mkString(" AND ")
    def extractFrom(src: String) =
      s"""SELECT DISTINCT query_text, poi_name FROM (
         |  SELECT query_text, trim(raw_name) AS poi_name FROM (
         |    SELECT query_text,
         |      unnest(regexp_extract_all(concat_ws(' ', title, snippet),
         |        '(?i)$quotedPattern', 1)) AS raw_name
         |    FROM $src))
         |WHERE length(poi_name) > 3 AND length(poi_name) < 50 AND $blocked""".stripMargin
    val extract = extractFrom(trendCandidateValues)
    Map(
      "tr_poi_extraction_vol" -> extractFrom(trendCandsVolSql),
      "tr_validation" ->
        s"""SELECT query_text, poi_name, matched_poi_id,
           |  matched_poi_id IS NOT NULL AS exists_in_db,
           |  CAST(CASE WHEN matched_poi_id IS NULL THEN 0.3 ELSE 0.0 END AS DOUBLE) AS novelty_boost
           |FROM (
           |  SELECT e.query_text, e.poi_name, poi.id AS matched_poi_id,
           |    row_number() OVER (PARTITION BY e.query_text, e.poi_name
           |      ORDER BY coalesce(poi.id, 'zzzz') ASC) AS rn
           |  FROM ($extract) e
           |  LEFT JOIN ${Fixtures.poiValues}
           |    ON contains(lower(poi.name), lower(e.poi_name)))
           |WHERE rn = 1""".stripMargin,
      "tr_poi_extraction" -> extract,
      "tr_discovery_log" ->
        s"""SELECT query_text,
           |  array_to_string(list_sort(list(poi_name)), '|') AS poi_names_extracted,
           |  count(*) AS results_count
           |FROM ($extract) GROUP BY query_text""".stripMargin)
  }
}
