package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SERP cache with TTL (SURVEY §2.1 S4 / §4 caching; reference:
  * utils/api_cache.py:16-166 — key = md5(api:query:params), TTL 24/48 h;
  * cse_client.py:123-182). As a dataflow: the cache is a keyed table with
  * `cached_at`; a request batch left-joins it and each request is classified
  * HIT (fresh), STALE (expired), or MISS — the MISS/STALE set is what the
  * rate-limited source would fetch. At scale the cache table is the Delta
  * table keyed by the same md5, and this is one broadcast/shuffle join.
  */
object SerpCache {

  val asOf = "2025-06-01 12:00:00"

  /** (api, query, params, response_ref, cached_at). */
  val cacheEntries: Seq[(String, String, String, String, String)] = Seq(
    ("cse", "best bistro paris", "gl=fr&num=10", "resp1", "2025-06-01 02:00:00"),
    ("cse", "new cafe marais", "gl=fr&num=10", "resp2", "2025-05-29 00:00:00"),
    ("cse", "wine bar bastille", "gl=fr&num=10", "resp3", "2025-06-01 11:30:00"),
    ("places", "nearby 48.85,2.35", "type=restaurant", "resp4", "2025-05-26 00:00:00"))

  /** (req_id, api, query, params, ttl_seconds). */
  val requests: Seq[(String, String, String, String, Int)] = Seq(
    ("q1", "cse", "best bistro paris", "gl=fr&num=10", 86400),
    ("q2", "cse", "new cafe marais", "gl=fr&num=10", 86400),
    ("q3", "cse", "wine bar bastille", "gl=fr&num=10", 3600),
    ("q4", "cse", "uncached query", "gl=fr&num=10", 86400),
    ("q5", "places", "nearby 48.85,2.35", "type=restaurant", 604800))

  private def cacheDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cacheEntries.toDF("api", "query", "params", "response_ref", "cached_at")
      .withColumn("cached_at", to_timestamp(col("cached_at")))
      .withColumn("cache_key", md5(concat_ws(":", col("api"), col("query"), col("params")).cast("binary")))
  }

  private def requestsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    requests.toDF("req_id", "api", "query", "params", "ttl_seconds")
      .withColumn("cache_key", md5(concat_ws(":", col("api"), col("query"), col("params")).cast("binary")))
  }

  /** Classify each request against the cache at `asOf`. */
  def lookup(reqs: DataFrame, cache: DataFrame, asOf: String): DataFrame = {
    val age = unix_timestamp(to_timestamp(lit(asOf))) - unix_timestamp(col("cached_at"))
    reqs.join(broadcast(cache.select(col("cache_key"), col("response_ref"), col("cached_at"))),
        Seq("cache_key"), "left")
      .withColumn("age_seconds", age.cast("long"))
      .withColumn("status",
        when(col("cached_at").isNull, "MISS")
          .when(col("age_seconds") <= col("ttl_seconds"), "HIT")
          .otherwise("STALE"))
      .select(col("req_id"), col("cache_key"),
        when(col("status") === "HIT", col("response_ref")).as("response_ref"),
        col("age_seconds"), col("status"))
  }

  def qCacheLookup(spark: SparkSession, dir: String): DataFrame =
    lookup(requestsDf(spark), cacheDf(spark), asOf)

  // ------------------------------------------------ S4 at sf-scale VOLUME

  /** TPC-H-anchored "now" for the volume variant. */
  val asOfVol = "1998-08-02 00:00:00"

  /** Cache table derived from `orders` (VolumeFixtures arithmetic): the
    * orderkey%3==0 slice, entries aged 0..200k seconds so HIT/STALE mix
    * per-TTL. */
  private def cacheVolDf(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        when(col("o_orderkey") % 2 === 0, "cse").otherwise("places").as("api"),
        concat(lit("q"), col("o_orderkey")).as("query"),
        lit("gl=fr&num=10").as("params"),
        concat(lit("r"), col("o_orderkey")).as("response_ref"),
        expr(s"timestampadd(SECOND, -CAST(o_orderkey % 200000 AS INT), TIMESTAMP '$asOfVol')")
          .as("cached_at"))
      .withColumn("cache_key",
        md5(concat_ws(":", col("api"), col("query"), col("params")).cast("binary")))

  /** Request batch: the orderkey%2==0 slice (cache hit possible iff
    * orderkey%6==0) with four TTL classes, so all of HIT/STALE/MISS occur
    * in volume. */
  private def requestsVolDf(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(
        concat(lit("req"), col("o_orderkey")).as("req_id"),
        lit("cse").as("api"),
        concat(lit("q"), col("o_orderkey")).as("query"),
        lit("gl=fr&num=10").as("params"),
        when(col("o_orderkey") % 8 === 0, 3600)
          .when(col("o_orderkey") % 8 === 2, 86400)
          .when(col("o_orderkey") % 8 === 4, 604800)
          .otherwise(43200).as("ttl_seconds"))
      .withColumn("cache_key",
        md5(concat_ws(":", col("api"), col("query"), col("params")).cast("binary")))

  /** [[qCacheLookup]] at volume: tens of thousands of requests against a
    * derived cache table through the same broadcast md5-key join — the
    * rate-limiter's MISS/STALE fetch set computed at data scale. */
  def qCacheLookupVol(spark: SparkSession, dir: String): DataFrame =
    lookup(requestsVolDf(spark, dir), cacheVolDf(spark, dir), asOfVol)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s4_serp_cache_lookup" -> (qCacheLookup _),
    "s4_serp_cache_vol" -> (qCacheLookupVol _))

  private def esc(s: String) = s.replace("'", "''")
  private def cacheValues: String = cacheEntries.map { case (a, q, p, r, t) =>
    s"('${esc(a)}', '${esc(q)}', '${esc(p)}', '$r', TIMESTAMP '$t')"
  }.mkString("(VALUES ", ", ", ")") + " AS c(api, query, params, response_ref, cached_at)"
  private def requestValues: String = requests.map { case (id, a, q, p, ttl) =>
    s"('$id', '${esc(a)}', '${esc(q)}', '${esc(p)}', $ttl)"
  }.mkString("(VALUES ", ", ", ")") + " AS r(req_id, api, query, params, ttl_seconds)"

  val oracles: Map[String, String] = Map(
    "s4_serp_cache_vol" ->
      s"""WITH cache AS (
         |  SELECT md5(api || ':' || query || ':' || params) AS cache_key,
         |    response_ref, cached_at
         |  FROM (SELECT
         |      CASE WHEN o_orderkey % 2 = 0 THEN 'cse' ELSE 'places' END AS api,
         |      'q' || o_orderkey AS query,
         |      'gl=fr&num=10' AS params,
         |      'r' || o_orderkey AS response_ref,
         |      TIMESTAMP '$asOfVol' - INTERVAL (o_orderkey % 200000) SECOND AS cached_at
         |    FROM orders WHERE o_orderkey % 3 = 0)),
         |reqs AS (
         |  SELECT 'req' || o_orderkey AS req_id,
         |    CAST(CASE o_orderkey % 8 WHEN 0 THEN 3600 WHEN 2 THEN 86400
         |         WHEN 4 THEN 604800 ELSE 43200 END AS BIGINT) AS ttl_seconds,
         |    md5('cse:q' || o_orderkey || ':gl=fr&num=10') AS cache_key
         |  FROM orders WHERE o_orderkey % 2 = 0)
         |SELECT req_id, r.cache_key,
         |  CASE WHEN c.cached_at IS NOT NULL
         |        AND CAST(epoch(TIMESTAMP '$asOfVol') - epoch(c.cached_at) AS BIGINT) <= ttl_seconds
         |       THEN c.response_ref END AS response_ref,
         |  CAST(epoch(TIMESTAMP '$asOfVol') - epoch(c.cached_at) AS BIGINT) AS age_seconds,
         |  CASE WHEN c.cached_at IS NULL THEN 'MISS'
         |       WHEN CAST(epoch(TIMESTAMP '$asOfVol') - epoch(c.cached_at) AS BIGINT) <= ttl_seconds THEN 'HIT'
         |       ELSE 'STALE' END AS status
         |FROM reqs r LEFT JOIN cache c USING (cache_key)""".stripMargin,
    "s4_serp_cache_lookup" ->
      s"""WITH cache AS (
         |  SELECT md5(api || ':' || query || ':' || params) AS cache_key,
         |    response_ref, cached_at
         |  FROM $cacheValues),
         |reqs AS (
         |  SELECT req_id, ttl_seconds,
         |    md5(api || ':' || query || ':' || params) AS cache_key
         |  FROM $requestValues)
         |SELECT req_id, r.cache_key,
         |  CASE WHEN c.cached_at IS NOT NULL
         |        AND CAST(epoch(TIMESTAMP '$asOf') - epoch(c.cached_at) AS BIGINT) <= ttl_seconds
         |       THEN c.response_ref END AS response_ref,
         |  CAST(epoch(TIMESTAMP '$asOf') - epoch(c.cached_at) AS BIGINT) AS age_seconds,
         |  CASE WHEN c.cached_at IS NULL THEN 'MISS'
         |       WHEN CAST(epoch(TIMESTAMP '$asOf') - epoch(c.cached_at) AS BIGINT) <= ttl_seconds THEN 'HIT'
         |       ELSE 'STALE' END AS status
         |FROM reqs r LEFT JOIN cache c USING (cache_key)""".stripMargin)
}
