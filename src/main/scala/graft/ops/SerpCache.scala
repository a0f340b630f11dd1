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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s4_serp_cache_lookup" -> (qCacheLookup _))

  private def esc(s: String) = s.replace("'", "''")
  private def cacheValues: String = cacheEntries.map { case (a, q, p, r, t) =>
    s"('${esc(a)}', '${esc(q)}', '${esc(p)}', '$r', TIMESTAMP '$t')"
  }.mkString("(VALUES ", ", ", ")") + " AS c(api, query, params, response_ref, cached_at)"
  private def requestValues: String = requests.map { case (id, a, q, p, ttl) =>
    s"('$id', '${esc(a)}', '${esc(q)}', '${esc(p)}', $ttl)"
  }.mkString("(VALUES ", ", ", ")") + " AS r(req_id, api, query, params, ttl_seconds)"

  val oracles: Map[String, String] = Map(
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
