package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic in-code domain fixtures (FIXTURES.md §B).
  *
  * Single source of truth: each fixture is a Scala value rendered BOTH as a
  * Spark DataFrame and as a SQL VALUES clause for the DuckDB oracle, so the
  * engine and the oracle can never see different data. Timestamps are midnight
  * UTC so integer day arithmetic matches on both sides. `asOf` is the explicit
  * "now" every domain operator takes (FIXTURES.md determinism rules).
  */
object Fixtures {

  val asOf = "2025-06-01 00:00:00"

  // --------------------------------------------------------------- poi (b1)

  /** (id, name, category, city, rating, reviews_count, first_seen_at,
    * eligibility_status). Personas per intelligent_classifier.py:590-632:
    * p1 new+trending cafe, p2 established bistro, p3 struggling bar,
    * p4 hidden-gem wine bar; plus p5 bakery (momentum multiplier), p6
    * null-rating, p7 heavyweight approved, p8 null-created_at mention path. */
  val pois: Seq[(String, String, String, String, Option[Double], Option[Int], Option[String], String)] = Seq(
    ("p1", "New Trendy Cafe", "cafe", "paris", Some(4.8), Some(50), Some("2025-05-10 00:00:00"), "hold"),
    ("p2", "Classic Bistro", "restaurant", "paris", Some(4.2), Some(800), Some("2024-01-15 00:00:00"), "eligible"),
    ("p3", "Struggling Bar", "bar", "paris", Some(3.2), Some(20), Some("2024-11-20 00:00:00"), "hold"),
    ("p4", "Secret Wine Bar", "bar", "paris", Some(4.7), Some(120), Some("2025-02-20 00:00:00"), "hold"),
    ("p5", "Boulangerie Moderne", "bakery", "paris", Some(4.5), Some(210), Some("2024-06-01 00:00:00"), "eligible"),
    ("p6", "Mystery Spot", "restaurant", "paris", None, Some(5), None, "hold"),
    ("p7", "Grand Institution", "restaurant", "lyon", Some(4.9), Some(1500), Some("2023-03-01 00:00:00"), "approved"),
    ("p8", "Cafe Sans Date", "cafe", "lyon", Some(4.4), Some(90), Some("2025-04-25 00:00:00"), "hold"))

  // ---------------------------------------------- source_mention (b3 subset)

  /** (id, poi_id, source_type, authority_weight, match_score, w_time
    * (None → computed/fallback), created_at (None → 0.5 fallback in A1 and
    * excluded from windowed checks)). */
  val mentions: Seq[(String, String, String, Option[Double], Option[Double], Option[Double], Option[String])] = Seq(
    ("m01", "p1", "guide", Some(0.9), Some(0.95), Some(0.9),  Some("2025-05-20 00:00:00")),
    ("m02", "p1", "press", Some(0.8), Some(0.90), Some(0.85), Some("2025-05-25 00:00:00")),
    ("m03", "p2", "guide", Some(1.0), Some(0.92), None,       Some("2024-09-01 00:00:00")),
    ("m04", "p2", "press", Some(0.7), Some(0.80), Some(0.4),  Some("2025-03-10 00:00:00")),
    ("m05", "p4", "press", Some(0.8), Some(0.85), Some(0.5),  Some("2025-04-15 00:00:00")),
    ("m06", "p4", "local", Some(0.5), Some(0.75), Some(0.7),  Some("2025-05-15 00:00:00")),
    ("m07", "p4", "local", Some(0.4), Some(0.70), None,       Some("2025-05-28 00:00:00")),
    ("m08", "p5", "local", Some(0.6), Some(0.88), Some(0.85), Some("2025-05-22 00:00:00")),
    ("m09", "p7", "guide", Some(1.0), Some(0.98), Some(0.95), Some("2025-05-18 00:00:00")),
    ("m10", "p7", "guide", Some(1.0), Some(0.96), Some(0.92), Some("2025-05-26 00:00:00")),
    ("m11", "p7", "press", Some(0.9), Some(0.94), Some(0.88), Some("2025-05-29 00:00:00")),
    ("m12", "p8", "blog",  Some(0.4), Some(0.60), None,       None),
    ("m13", "p2", "local", None,      None,       Some(0.3),  Some("2024-12-01 00:00:00")))

  // ------------------------------------------------- rating_snapshot (b2)

  /** (poi_id, source_id, rating_value, reviews_count, captured_at). The
    * classifier reads the same rows via created_at (reference schema drift,
    * SURVEY §1.2 — the engine standardizes on captured_at). */
  val snapshots: Seq[(String, String, Double, Int, String)] = Seq(
    ("p1", "google", 4.7, 38, "2025-05-20 00:00:00"),
    ("p1", "google", 4.8, 50, "2025-05-30 00:00:00"),
    ("p2", "google", 4.2, 790, "2025-05-19 00:00:00"),
    ("p2", "google", 4.2, 796, "2025-05-26 00:00:00"),
    ("p2", "google", 4.2, 800, "2025-05-31 00:00:00"),
    ("p2", "google", 4.1, 700, "2025-01-10 00:00:00"),
    ("p3", "google", 3.2, 20, "2025-05-25 00:00:00"),
    ("p4", "google", 4.7, 117, "2025-05-21 00:00:00"),
    ("p4", "google", 4.7, 120, "2025-05-29 00:00:00"),
    ("p5", "google", 4.5, 206, "2025-05-20 00:00:00"),
    ("p5", "google", 4.5, 210, "2025-05-27 00:00:00"),
    ("p7", "google", 4.9, 1491, "2025-05-18 00:00:00"),
    ("p7", "google", 4.9, 1500, "2025-05-30 00:00:00"),
    ("p8", "google", 4.4, 90, "2025-04-01 00:00:00"))

  // ----------------------------------------------- source_catalog (b4)

  /** (source_id, base_url, type, authority_weight, is_active). */
  val catalog: Seq[(String, String, String, Double, Boolean)] = Seq(
    ("lefooding", "https://www.lefooding.com", "guide", 0.9, true),
    ("timeout", "https://www.timeout.fr", "press", 0.8, true),
    ("sortiraparis", "https://www.sortiraparis.com", "press", 0.7, true),
    ("michelin", "https://guide.michelin.com", "guide", 1.0, true),
    ("parisbouge", "https://parisbouge.com", "local", 0.5, true),
    ("deadblog", "https://deadblog.fr", "blog", 0.3, false),
    ("mysteryfr", "https://mystery.fr", "unknown", 0.4, true))

  // ------------------------------------------- serp candidates (b7 subset)

  /** (cand_id, poi_id, poi_name, poi_lat, poi_lng, title, snippet, url,
    * domain, name_match). `name_match` is fixture INPUT (the name-scoring
    * expressions are pinned separately — they are not SQL-expressible), so the
    * whole §2.8 arithmetic/decision tree stays oracle-checkable. Rows cover
    * the decision table (scoring.py:138-179): confirmed-domain auto-accept,
    * score_high accept, country-mismatch hard reject, mid-conditional review,
    * mid-conditions-failed reject, score-too-low reject, excluded domain. */
  val serpCandidates: Seq[(String, String, String, Double, Double, String, String, String, String, Double, Option[String])] = Seq(
    ("c1", "p1", "New Trendy Cafe", 48.8566, 2.3522,
      "New Trendy Cafe Paris review", "the best new cafe in paris 75001",
      "https://www.lefooding.com/paris/new-trendy-cafe", "lefooding.com", 0.90, Some("2025-05-01")),
    ("c2", "p2", "Classic Bistro", 48.8600, 2.3400,
      "Classic Bistro guide", "michelin selection bistro",
      "https://guide.michelin.com/fr/paris/classic-bistro", "guide.michelin.com", 0.60, None),
    ("c3", "p1", "New Trendy Cafe", 48.8566, 2.3522,
      "New Trendy Cafe", "the best bistro in germany",
      "https://bistro-blog.de/new-trendy-cafe", "bistro-blog.de", 0.80, Some("2025-04-10")),
    ("c4", "p4", "Secret Wine Bar", 48.8700, 2.3600,
      "wine bars we love downtown", "a quiet spot",
      "https://unknown-blog.net/wine-bars", "unknown-blog.net", 0.35, Some("2025-05-20")),
    ("c5", "p3", "Struggling Bar", 48.8400, 2.3300,
      "ten random drinks", "nothing relevant here",
      "https://random-site.org/drinks", "random-site.org", 0.08, None),
    ("c6", "p2", "Classic Bistro", 48.6000, 2.1000,
      "classic bistro memories", "a story about food",
      "https://deadblog.fr/story", "deadblog.fr", 0.45, Some("2024-01-01")),
    ("c7", "p5", "Boulangerie Moderne", 48.8570, 2.3530,
      "boulangerie moderne bakery", "croissants to die for",
      "https://parisbouge.com/boulangerie-moderne", "parisbouge.com", 0.50, Some("2024-11-13")),
    ("c9", "p1", "New Trendy Cafe", 48.8566, 2.3522,
      "trendy cafes 2025", "our selection",
      "https://www.sortiraparis.com/paris-cafes/75010-guide", "sortiraparis.com", 0.55, Some("2025-05-25")),
    ("c10", "p1", "New Trendy Cafe", 48.8566, 2.3522,
      "New Trendy Cafe instagram", "photos and reels paris",
      "https://www.instagram.com/newtrendycafe", "instagram.com", 0.95, Some("2025-05-30")))

  /** Excluded domains (P6; config.json:114-139 subset). */
  val excludedDomains: Seq[String] = Seq(
    "instagram.com", "facebook.com", "tripadvisor.fr", "tripadvisor.com",
    "yelp.fr", "yelp.com", "booking.com", "ubereats.com")

  /** Paris city profile literals (city_profiles.py:36-44). */
  object ParisProfile {
    val aliases = Seq("paris", "parís", "parigi", "パリ")
    val adminNames = Seq("île-de-france", "grand paris", "region parisienne")
    val postalPrefixes = Seq("75", "750")
    val countryIndicators = Seq("france", "fr")
    val countryMismatchPatterns = Seq(
      "\\benglish\\b", "\\bunited states\\b", "\\busa\\b",
      "\\bgermany\\b", "\\bspain\\b", "\\bitaly\\b")
    val centroidLat = 48.8566
    val centroidLng = 2.3522
  }

  // ------------------------------------------------------ DataFrame views

  def poiDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pois.toDF("id", "name", "category", "city", "rating", "reviews_count",
      "first_seen_at", "eligibility_status")
      .withColumn("first_seen_at", to_timestamp(col("first_seen_at")))
  }

  def mentionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mentions.toDF("id", "poi_id", "source_type", "authority_weight",
      "match_score", "w_time", "created_at")
      .withColumn("created_at", to_timestamp(col("created_at")))
  }

  def snapshotsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshots.toDF("poi_id", "source_id", "rating_value", "reviews_count", "captured_at")
      .withColumn("captured_at", to_timestamp(col("captured_at")))
  }

  def catalogDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    catalog.toDF("source_id", "base_url", "type", "authority_weight", "is_active")
  }

  def serpCandidatesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    serpCandidates.toDF("cand_id", "poi_id", "poi_name", "poi_lat", "poi_lng",
      "title", "snippet", "url", "domain", "name_match", "published_at")
  }

  // -------------------------------------------------------- VALUES SQL

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlTs(s: Option[String]): String =
    s.map(v => s"TIMESTAMP ${sqlStr(v)}").getOrElse("CAST(NULL AS TIMESTAMP)")
  // doubles are CAST explicitly: DuckDB would otherwise type VALUES literals
  // as DECIMAL and return Decimal results that hash differently from Spark's
  private def sqlDbl(v: Double): String = s"CAST($v AS DOUBLE)"
  private def sqlDblOpt(v: Option[Double]): String =
    v.map(sqlDbl).getOrElse("CAST(NULL AS DOUBLE)")
  private def sqlIntOpt(v: Option[Int]): String =
    v.map(_.toString).getOrElse("CAST(NULL AS INTEGER)")

  /** poi VALUES clause for oracle CTEs. */
  def poiValues: String = pois.map { case (id, n, cat, city, r, rc, fs, es) =>
    s"(${sqlStr(id)}, ${sqlStr(n)}, ${sqlStr(cat)}, ${sqlStr(city)}, ${sqlDblOpt(r)}, ${sqlIntOpt(rc)}, ${sqlTs(fs)}, ${sqlStr(es)})"
  }.mkString("(VALUES ", ", ", ")") +
    " AS poi(id, name, category, city, rating, reviews_count, first_seen_at, eligibility_status)"

  def mentionValues: String = mentions.map { case (id, pid, st, aw, ms, wt, ca) =>
    s"(${sqlStr(id)}, ${sqlStr(pid)}, ${sqlStr(st)}, ${sqlDblOpt(aw)}, ${sqlDblOpt(ms)}, ${sqlDblOpt(wt)}, ${sqlTs(ca)})"
  }.mkString("(VALUES ", ", ", ")") +
    " AS m(id, poi_id, source_type, authority_weight, match_score, w_time, created_at)"

  def snapshotValues: String = snapshots.map { case (pid, sid, rv, rc, ca) =>
    s"(${sqlStr(pid)}, ${sqlStr(sid)}, ${sqlDbl(rv)}, $rc, TIMESTAMP ${sqlStr(ca)})"
  }.mkString("(VALUES ", ", ", ")") +
    " AS s(poi_id, source_id, rating_value, reviews_count, captured_at)"

  def catalogValues: String = catalog.map { case (sid, url, t, aw, act) =>
    s"(${sqlStr(sid)}, ${sqlStr(url)}, ${sqlStr(t)}, ${sqlDbl(aw)}, $act)"
  }.mkString("(VALUES ", ", ", ")") +
    " AS c(source_id, base_url, type, authority_weight, is_active)"

  def serpCandidateValues: String = serpCandidates.map {
    case (cid, pid, pn, lat, lng, ti, sn, url, dom, nm, pub) =>
      val pubSql = pub.map(v => s"DATE '" + v + "'").getOrElse("CAST(NULL AS DATE)")
      s"(${sqlStr(cid)}, ${sqlStr(pid)}, ${sqlStr(pn)}, ${sqlDbl(lat)}, ${sqlDbl(lng)}, ${sqlStr(ti)}, ${sqlStr(sn)}, ${sqlStr(url)}, ${sqlStr(dom)}, ${sqlDbl(nm)}, $pubSql)"
  }.mkString("(VALUES ", ", ", ")") +
    " AS cand(cand_id, poi_id, poi_name, poi_lat, poi_lng, title, snippet, url, domain, name_match, published_at)"

  def excludedDomainValues: String =
    excludedDomains.map(d => s"(${sqlStr(d)})").mkString("(VALUES ", ", ", ")") + " AS x(domain)"
}
