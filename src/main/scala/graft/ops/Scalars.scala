package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.7) + the composite score formulas the
  * reference hard-codes (§2.4 A2/A13/A5/A8/A15), mapped onto the testdata so the
  * DuckDB oracle hash-checks the arithmetic, string, date and JSON behavior.
  *
  * Fixture-driven queries (URLs, date strings) define the fixture ONCE as Scala
  * data; the oracle SQL embeds the same rows via VALUES generated from it, so
  * engine and oracle can never drift.
  */
object Scalars {

  // ---------------------------------------------------------------- fixtures

  /** URL fixture for P11 normalization + P14 domain extraction
    * (scanner.py:864-883, domains.py:13-100, dedup.py:18-45). */
  private val urlFixture: Seq[(Int, String)] = Seq(
    1 -> "https://www.lefooding.com/restaurants/le-rigmarole?utm_source=tw&utm_medium=s",
    2 -> "https://guide.michelin.com/fr/fr/paris/restaurant/abc#reviews",
    3 -> "http://timeout.fr/paris/food/best-bistros/",
    4 -> "https://www.sortiraparis.com/en/hotels-restaurants/pages/art?page=2&utm_c=x",
    5 -> "https://blog.example.co/posts/2024/03/new-cafe-opening#comments",
    6 -> "http://www.paris-bistro.fr/fr/menu/")

  /** Date-string fixture for the multi-format parse cascade
    * (date_enricher.py:265-414). */
  private val dateFixture: Seq[(Int, String)] = Seq(
    1 -> "2024-03-01",
    2 -> "01/03/2024",
    3 -> "March 01, 2024",
    4 -> "2024-03-01T10:20:30Z",
    5 -> "not a date",
    6 -> "2024-13-45")

  private def valuesSql(rows: Seq[(Int, String)], cols: String): String =
    rows.map { case (i, s) => s"($i, '${s.replace("'", "''")}')" }
      .mkString(s"(VALUES ", ", ", s") AS t($cols)")

  private def fixtureDf(spark: SparkSession, rows: Seq[(Int, String)],
      idCol: String, valCol: String): DataFrame = {
    import spark.implicits._
    rows.toDF(idCol, valCol)
  }

  /** Adversarial normalization vectors — accents, ligatures, typographic
    * apostrophes, symbol chars, `st`/`ste` expansion, whitespace runs, em
    * dash. Hash-pins the `TextAlgo.normalize` ⇄ `TextAlgo.normalizeSql`
    * replay contract on the non-ASCII paths the other fixtures never hit
    * (NFD-vs-strip_accents, ligature substitution, apostrophe elision). */
  private val normFixture: Seq[(Int, String)] = Seq(
    1 -> "Caf\u00e9 de l\u2019\u0152uvre",
    2 -> "Le Bistro & Caf\u00e9 \u2014 Saint-Honor\u00e9  \u21165",
    3 -> " st malo & ste anne ",
    4 -> "l'\u00c9p\u00e9e  d`Or!!",
    5 -> "\u00c6on  caf\u00e9s \u0153uf",
    6 -> "A&B   c  ",
    7 -> "No\u00ebl \u00e0 P\u00e4ris_42",
    // boundary cases of the strip_accents \u2259 NFD+drop-Mn equivalence
    // (VERDICT r8 stretch): DECOMPOSED source text (combining marks already
    // present \u2014 NFD is a no-op, the mark-drop must still fire) \u2026
    8 -> "Cafe\u0301 De\u0301compose\u0301 A\u030a",
    // \u2026 and the Turkish dotted/dotless i family: \u0130 (U+0130) NFD-decomposes
    // to I + combining dot which drops to plain 'i'; dotless \u0131 (U+0131) has
    // no decomposition and must survive untouched in both engines
    9 -> "\u0130stanbul Caf\u00e9",
    10 -> "k\u0131rm\u0131z\u0131 b\u0131y\u0131k")

  // ---------------------------------------------------------------- queries

  /** P5 — last-delimited-field extraction (country from address,
    * google_places_ingester.py:297-309). */
  def p5LastField(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(element_at(split(col("o_orderpriority"), "-"), -1).as("priority_label"))
      .groupBy(col("priority_label"))
      .agg(count(lit(1)).as("n"))

  /** P11 — URL normalization chain: strip fragment, utm_* params, trailing
    * slash/?; language-segment strip from the dedupe key (dedup.py:36-43). */
  def p11UrlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val base = fixtureDf(spark, urlFixture, "url_id", "url")
    val noFrag  = regexp_replace(col("url"), "#.*$", "")
    val noUtm   = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
    val noTrail = regexp_replace(regexp_replace(noUtm, "/$", ""), "\\?$", "")
    val dedupeKey = regexp_replace(noTrail, "/(fr|en)/", "/")
    base.select(col("url_id"), noTrail.as("normalized_url"), dedupeKey.as("dedupe_key"))
  }

  /** P14 — domain + apex extraction with www-strip (domains.py:13-100). */
  def p14DomainExtract(spark: SparkSession, dir: String): DataFrame = {
    val base = fixtureDf(spark, urlFixture, "url_id", "url")
    val host = regexp_replace(
      regexp_extract(col("url"), "^https?://([^/?#]+)", 1), "^www\\.", "")
    val parts = split(host, "\\.")
    val apex = concat_ws(".", slice(parts, -2, 2))
    base.select(col("url_id"), host.as("domain"), apex.as("apex_domain"))
  }

  /** Date parse cascade — multi-format with null on failure
    * (date_enricher.py:265-414; validation window semantics at :416-430). */
  def sDateParseCascade(spark: SparkSession, dir: String): DataFrame = {
    val base = fixtureDf(spark, dateFixture, "row_id", "raw")
    val parsed = coalesce(
      try_to_timestamp(col("raw"), lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(col("raw"), lit("yyyy-MM-dd")),
      try_to_timestamp(col("raw"), lit("dd/MM/yyyy")),
      try_to_timestamp(col("raw"), lit("MMMM dd, yyyy")))
    base.select(col("row_id"), date_format(parsed, "yyyy-MM-dd").as("parsed_date"))
  }

  /** Slug generation (collection_generator.py:355-362,1035-1092). */
  def sSlugify(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      regexp_replace(lower(concat_ws(" ", col("p_name"), col("p_type"))),
        "[^a-z0-9]+", "-").as("slug"))

  /** P12 normalization golden vectors as a DECLARED query: the Catalyst
    * `normalize_text` expression over [[normFixture]], hash-compared against
    * a DuckDB oracle that recomputes the entire normalize chain via
    * [[graft.expr.TextAlgo.normalizeSql]] — so the replay contract the
    * `j5_trigram_topk` / `mention_trigram_scores` oracles depend on is
    * itself driver-checked on adversarial non-ASCII input every round. */
  def sNormalizeVectors(spark: SparkSession, dir: String): DataFrame =
    fixtureDf(spark, normFixture, "row_id", "raw")
      .select(col("row_id"), graft.expr.functions.normalize_text(col("raw")).as("norm"))

  /** Calendar aggregation — orders per year/month (monitoring cadence §2.9). */
  def sMonthAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))

  /** JSON field extraction (from_json; reference reads JSON blobs everywhere,
    * e.g. score_components, tags — SURVEY §1.1). Oracle uses a regex on the
    * raw string: different mechanism, same value. */
  def sJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").cast("long").as("k_value"))
      .filter(col("k_value") >= 50)

  /** A2 — review score formula (intelligent_classifier.py:101-131):
    * 0.70·clamp((rating−3.5)/1.5)·100 + 0.30·clamp(log1p(n)/log1p(2000))·100,
    * ×0.85 category penalty. rating≈acctbal/1000, n≈custkey, penalty on
    * FURNITURE (stands in for bar/night_club). log1p spelled ln(1+x): the
    * oracle DuckDB has no log1p. */
  def a2ReviewScore(spark: SparkSession, dir: String): DataFrame = {
    def clamp01(c: Column) = least(greatest(c, lit(0.0)), lit(1.0))
    val rating = col("c_acctbal") / 1000.0
    val ratingComp = clamp01((rating - 3.5) / 1.5) * 100.0 * 0.70
    val volumeComp = clamp01(log(lit(1.0) + col("c_custkey")) / log(lit(2001.0))) * 100.0 * 0.30
    val raw = ratingComp + volumeComp
    val penalized = when(col("c_mktsegment") === "FURNITURE", raw * 0.85).otherwise(raw)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), round(penalized, 6).as("review_score"))
  }

  /** A13 — novelty score: bounded additive features incl. an anti-join
    * absence flag (h3_scheduler.py:619-678) + class thresholds 0.8/0.6/0.4. */
  def a13Novelty(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val heavyUse = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45)
      .select(col("l_partkey")).distinct()
    val joined = p.join(heavyUse, p("p_partkey") === heavyUse("l_partkey"), "left")
    // integer centi-points, not a double sum: 0.3+0.15+0.1+0.05 in binary
    // lands at 0.5999999…, putting the class threshold on the wrong side of
    // DuckDB's exact DECIMAL 0.6 for boundary rows (surfaced at sf0.1)
    val pts = least(
      when(col("p_size") <= 10, 40).otherwise(0)
        + when(col("l_partkey").isNull, 30).otherwise(0)
        + when(col("p_name").rlike("widget|gadget"), 15).otherwise(0)
        + when(col("p_type") === "PROMO", 10).otherwise(0)
        + when(col("p_brand").rlike("#1[0-9]$"), 5).otherwise(0),
      lit(100))
    joined.select(
      col("p_partkey"),
      round(pts / 100.0, 6).as("novelty_score"),
      when(pts >= 80, "highly_likely_new")
        .when(pts >= 60, "likely_new")
        .when(pts >= 40, "potentially_new")
        .otherwise("established").as("novelty_classification"))
  }

  /** A5/A6 — badge assembly + eligibility via conditional aggregation
    * (intelligent_classifier.py:264-369): one groupBy computing all badge
    * predicates, emitted as booleans + a canonical concat. */
  def a5Badges(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")).as("sum_price"),
        max(col("o_totalprice")).as("max_price"),
        count(when(col("o_orderdate") >= lit("2000-01-01").cast("date"), 1)).as("n_recent"))
    val frequent  = col("n_orders") >= 15
    val bigSpend  = col("sum_price") >= 500000.0
    val active    = col("n_recent") >= 3
    feats.select(
      col("o_custkey"), col("n_orders"),
      frequent.as("badge_frequent"),
      bigSpend.as("badge_big_spender"),
      active.as("badge_recently_active"),
      concat_ws(",",
        when(frequent, "frequent"),
        when(bigSpend, "big_spender"),
        when(active, "recently_active")).as("badges"),
      when(bigSpend && (frequent || active), "approved")
        .when(frequent, "eligible")
        .otherwise("hold").as("eligibility_status"))
  }

  /** A8 — per-group percentage distribution (mood distribution,
    * utils/database.py:1000-1043). */
  def a8PctDistribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderpriority"))
    counts.select(
      col("o_orderpriority"), col("o_orderstatus"),
      col("cnt"),
      round(col("cnt") * 100.0 / sum(col("cnt")).over(w), 4).as("pct"))
  }

  /** A15 — saturation predicate per scan unit (h3_scheduler.py:256-267):
    * total ≥ cap OR any single category at the per-request limit. */
  def a15Saturation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity")).as("raw_total"),
        max(col("l_quantity")).as("raw_max"),
        count(lit(1)).as("n_items"))
      .select(
        col("l_orderkey"),
        round(col("raw_total"), 4).as("total_qty"),
        round(col("raw_max"), 4).as("max_qty"),
        col("n_items"),
        (col("raw_total") >= 150.0 || col("raw_max") >= 49.0).as("saturated"))

  /** W7 — photo ranking (photo_manager.py:96-98,276): top-5 by pixel count
    * desc with deterministic tie-break, plus a quality ordering. */
  private val photoFixture: Seq[(String, String, Int, Int, Double)] = Seq(
    ("ph1", "poiA", 4000, 3000, 0.81), ("ph2", "poiA", 1920, 1080, 0.92),
    ("ph3", "poiA", 800, 600, 0.55), ("ph4", "poiA", 3000, 2000, 0.77),
    ("ph5", "poiA", 1024, 768, 0.60), ("ph6", "poiA", 640, 480, 0.99),
    ("ph7", "poiB", 2048, 1536, 0.70), ("ph8", "poiB", 100, 100, 0.10))

  def w7PhotoRanking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val photos = photoFixture.toDF("photo_id", "poi_id", "width", "height", "quality")
    val w = Window.partitionBy(col("poi_id"))
      .orderBy((col("width") * col("height")).desc, col("photo_id").asc)
    photos.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("poi_id"), col("photo_id"),
        (col("width") * col("height")).cast("long").as("pixels"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Date validity window (date_enricher.py:416-430): 1990-01-01 ≤ d ≤
    * asOf+24h; appended to the parse cascade. */
  def sDateValidation(spark: SparkSession, dir: String): DataFrame = {
    val base = fixtureDf(spark, dateFixture :+ (7 -> "1989-06-01") :+ (8 -> "2031-01-01"),
      "row_id", "raw")
    val parsed = coalesce(
      try_to_timestamp(col("raw"), lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(col("raw"), lit("yyyy-MM-dd")))
    val asOfPlus = to_timestamp(lit("2025-06-02 00:00:00"))
    base.select(col("row_id"),
      date_format(parsed, "yyyy-MM-dd").as("parsed_date"),
      (parsed.isNotNull &&
        parsed >= to_timestamp(lit("1990-01-01 00:00:00")) &&
        parsed <= asOfPlus).as("is_valid"))
  }

  /** P13 stopword removal as a driver-gated query: the REAL kernel
    * (codegen'd [[graft.expr.Expressions.RemoveStopwords]] →
    * TextAlgo.removeStopwords, scoring.py:270-279) over the 2000-document
    * corpus, replayed in the oracle with DuckDB list lambdas and an IN-list
    * derived from the SAME Scala stopword set. Upgrades P13 from
    * golden-vector-only to hash-gated on real data. */
  def p13StopwordStrip(spark: SparkSession, dir: String): DataFrame = {
    val stripped = graft.expr.functions.remove_stopwords(col("text"))
    Tables.documents(spark, dir).select(col("doc_id"), stripped.as("stripped"),
      when(length(stripped) === 0, lit(0L))
        .otherwise(size(split(stripped, " ")).cast("long")).as("n_kept"))
  }

  private def p13StopwordSql: String = {
    val inList = graft.expr.TextAlgo.stopwordsKiss.toSeq.sorted
      .map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
       |      w -> len(w) > 2 AND w NOT IN ($inList)) AS kept
       |  FROM documents)
       |SELECT doc_id, array_to_string(kept, ' ') AS stripped,
       |  CAST(len(kept) AS BIGINT) AS n_kept
       |FROM t""".stripMargin
  }

  val queries: Map[String, Relational.Q] = Map(
    "w7_photo_ranking" -> (w7PhotoRanking _),
    "p13_stopword_strip" -> (p13StopwordStrip _),
    "s_date_validation" -> (sDateValidation _),
    "p5_last_field" -> (p5LastField _),
    "p11_url_normalize" -> (p11UrlNormalize _),
    "p14_domain_extract" -> (p14DomainExtract _),
    "s_date_parse_cascade" -> (sDateParseCascade _),
    "s_slugify" -> (sSlugify _),
    "s_normalize_vectors" -> (sNormalizeVectors _),
    "s_month_agg" -> (sMonthAgg _),
    "s_json_extract" -> (sJsonExtract _),
    "a2_review_score" -> (a2ReviewScore _),
    "a13_novelty" -> (a13Novelty _),
    "a5_badges" -> (a5Badges _),
    "a8_pct_distribution" -> (a8PctDistribution _),
    "a15_saturation" -> (a15Saturation _))

  private val urlValues  = valuesSql(urlFixture, "url_id, url")
  private val dateValues = valuesSql(dateFixture, "row_id, raw")

  private val photoValues = photoFixture.map { case (id, p, w, h, q) =>
    s"('$id', '$p', $w, $h, CAST($q AS DOUBLE))"
  }.mkString("(VALUES ", ", ", ")") + " AS ph(photo_id, poi_id, width, height, quality)"

  private val dateValidValues = valuesSql(
    dateFixture :+ (7 -> "1989-06-01") :+ (8 -> "2031-01-01"), "row_id, raw")

  val oracles: Map[String, String] = Map(
    "s_normalize_vectors" ->
      s"""SELECT row_id, ${graft.expr.TextAlgo.normalizeSql("raw")} AS norm
         |FROM ${valuesSql(normFixture, "row_id, raw")}""".stripMargin,
    "w7_photo_ranking" ->
      s"""SELECT poi_id, photo_id, CAST(width * height AS BIGINT) AS pixels, rnk
         |FROM (SELECT *, row_number() OVER (PARTITION BY poi_id
         |        ORDER BY width * height DESC, photo_id ASC) AS rnk
         |      FROM $photoValues) WHERE rnk <= 5""".stripMargin,
    "s_date_validation" -> s"""
      |SELECT row_id, strftime(p, '%Y-%m-%d') AS parsed_date,
      |  (p IS NOT NULL AND p >= TIMESTAMP '1990-01-01 00:00:00'
      |   AND p <= TIMESTAMP '2025-06-02 00:00:00') AS is_valid
      |FROM (SELECT row_id, coalesce(
      |        try_strptime(raw, '%Y-%m-%dT%H:%M:%SZ'),
      |        try_strptime(raw, '%Y-%m-%d')) AS p
      |      FROM $dateValidValues)""".stripMargin,
    "p5_last_field" ->
      """SELECT string_split(o_orderpriority, '-')[-1] AS priority_label, count(*) AS n
        |FROM orders GROUP BY priority_label""".stripMargin,
    "p11_url_normalize" -> s"""
      |SELECT url_id,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
      |    '#.*$$', ''), '[?&]utm_[^&#]*', '', 'g'), '/$$', ''), '\\?$$', '')
      |    AS normalized_url,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
      |    '#.*$$', ''), '[?&]utm_[^&#]*', '', 'g'), '/$$', ''), '\\?$$', ''),
      |    '/(fr|en)/', '/', 'g') AS dedupe_key
      |FROM $urlValues""".stripMargin,
    "p14_domain_extract" -> s"""
      |SELECT url_id, domain,
      |  array_to_string(string_split(domain, '.')[-2:], '.') AS apex_domain
      |FROM (SELECT url_id,
      |        regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
      |          '^www\\.', '') AS domain
      |      FROM $urlValues)""".stripMargin,
    "s_date_parse_cascade" -> s"""
      |SELECT row_id, strftime(coalesce(
      |  try_strptime(raw, '%Y-%m-%dT%H:%M:%SZ'),
      |  try_strptime(raw, '%Y-%m-%d'),
      |  try_strptime(raw, '%d/%m/%Y'),
      |  try_strptime(raw, '%B %d, %Y')), '%Y-%m-%d') AS parsed_date
      |FROM $dateValues""".stripMargin,
    "p13_stopword_strip" -> p13StopwordSql,
    "s_slugify" ->
      """SELECT p_partkey,
        |  regexp_replace(lower(concat(p_name, ' ', p_type)), '[^a-z0-9]+', '-', 'g') AS slug
        |FROM part""".stripMargin,
    "s_month_agg" ->
      """SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY order_year, order_month""".stripMargin,
    "s_json_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_value
        |FROM events WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) >= 50""".stripMargin,
    "a2_review_score" ->
      """SELECT c_custkey, round(
        |  CASE WHEN c_mktsegment = 'FURNITURE' THEN raw * 0.85 ELSE raw END, 6) AS review_score
        |FROM (SELECT c_custkey, c_mktsegment,
        |        least(greatest((c_acctbal / 1000.0 - 3.5) / 1.5, 0.0), 1.0) * 100.0 * 0.70
        |        + least(greatest(ln(1.0 + c_custkey) / ln(2001.0), 0.0), 1.0) * 100.0 * 0.30 AS raw
        |      FROM customer)""".stripMargin,
    "a13_novelty" ->
      """SELECT p_partkey,
        |  round(score, 6) AS novelty_score,
        |  CASE WHEN score >= 0.8 THEN 'highly_likely_new'
        |       WHEN score >= 0.6 THEN 'likely_new'
        |       WHEN score >= 0.4 THEN 'potentially_new'
        |       ELSE 'established' END AS novelty_classification
        |FROM (SELECT p_partkey, least(
        |    (CASE WHEN p_size <= 10 THEN 0.4 ELSE 0.0 END)
        |    + (CASE WHEN NOT EXISTS (SELECT 1 FROM lineitem
        |          WHERE l_partkey = p_partkey AND l_quantity > 45) THEN 0.3 ELSE 0.0 END)
        |    + (CASE WHEN regexp_matches(p_name, 'widget|gadget') THEN 0.15 ELSE 0.0 END)
        |    + (CASE WHEN p_type = 'PROMO' THEN 0.1 ELSE 0.0 END)
        |    + (CASE WHEN regexp_matches(p_brand, '#1[0-9]$') THEN 0.05 ELSE 0.0 END),
        |    1.0) AS score
        |  FROM part)""".stripMargin,
    "a5_badges" ->
      """SELECT o_custkey, n_orders,
        |  n_orders >= 15 AS badge_frequent,
        |  sum_price >= 500000.0 AS badge_big_spender,
        |  n_recent >= 3 AS badge_recently_active,
        |  concat_ws(',',
        |    CASE WHEN n_orders >= 15 THEN 'frequent' END,
        |    CASE WHEN sum_price >= 500000.0 THEN 'big_spender' END,
        |    CASE WHEN n_recent >= 3 THEN 'recently_active' END) AS badges,
        |  CASE WHEN sum_price >= 500000.0 AND (n_orders >= 15 OR n_recent >= 3) THEN 'approved'
        |       WHEN n_orders >= 15 THEN 'eligible'
        |       ELSE 'hold' END AS eligibility_status
        |FROM (SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS sum_price,
        |        max(o_totalprice) AS max_price,
        |        count(CASE WHEN o_orderdate >= DATE '2000-01-01' THEN 1 END) AS n_recent
        |      FROM orders GROUP BY o_custkey)""".stripMargin,
    "a8_pct_distribution" ->
      """SELECT o_orderpriority, o_orderstatus, cnt,
        |  round(cnt * 100.0 / sum(cnt) OVER (PARTITION BY o_orderpriority), 4) AS pct
        |FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |      FROM orders GROUP BY o_orderpriority, o_orderstatus)""".stripMargin,
    "a15_saturation" ->
      """SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty,
        |  round(max(l_quantity), 4) AS max_qty, count(*) AS n_items,
        |  (sum(l_quantity) >= 150.0 OR max(l_quantity) >= 49.0) AS saturated
        |FROM lineitem GROUP BY l_orderkey""".stripMargin)
}
