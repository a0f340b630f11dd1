package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 date-enrichment precedence + S7/J6 RSS feed join (SURVEY §2.1 S7/S8;
  * reference: mention_scanner/date_enricher.py:42-77 strategy order,
  * :79-102 SERP patterns, :104-131 RSS link match, :177-263 schema.org/
  * OpenGraph/meta, :265-297 URL inference, :299-327 Last-Modified,
  * :400-415 validation window).
  *
  * The network fetches (HTML GET, RSS GET, HEAD) are out of relational scope;
  * their PARSED ARTIFACTS arrive as columns (`page_meta`, `rss_entries`) and
  * the engine owns what the reference's enrich() does with them: the
  * source-precedence coalesce serp → rss → JSON-LD → OpenGraph → meta →
  * URL pattern → Last-Modified → unknown, each gated by the 1990..asOf+24h
  * validation window, with the reference's confidence/method labels.
  *
  * Everything is one broadcast-joined select of codegen'd column expressions —
  * per-URL work is embarrassingly parallel at 100 TB.
  */
object DateEnrichment {

  /** Validation window upper bound: asOf + 24 h clock-skew tolerance
    * (date_enricher.py:400-408). */
  private val validFrom = "1990-01-01"
  private val validTo = "2025-06-02" // Fixtures.asOf + 24h

  // ------------------------------------------------------------- fixtures

  /** (mention_id, source_id, url, snippet). */
  val mentions: Seq[(String, Option[String], String, String)] = Seq(
    ("m01", Some("lefooding"), "https://www.lefooding.com/a/jsonld-page",
      "published 15 mar 2024 in our city guide"), // serp wins over jsonld
    ("m02", Some("lefooding"), "https://www.lefooding.com/a/rss-covered",
      "no date in this snippet"), // rss wins over og
    ("m03", Some("timeout"), "https://www.timeout.fr/a/schema",
      "list of places"), // jsonld beats og
    ("m04", Some("timeout"), "https://www.timeout.fr/a/og-only",
      "more places"), // opengraph
    ("m05", None, "https://blog.example.net/meta-only",
      "even more places"), // meta_article
    ("m06", None, "https://blog.example.net/2024/03/15/story",
      "a story"), // url_inference (year-first)
    ("m07", None, "https://blog.example.net/archive?id=7",
      "an archive"), // http_last_modified
    ("m08", None, "https://blog.example.net/undated",
      "nothing here"), // unknown
    ("m09", Some("timeout"), "https://www.timeout.fr/a/future",
      "opening 10 jan 2030 maybe"), // serp future-invalid + meta future → last_modified
    ("m10", None, "https://blog.example.net/iso",
      "updated 2024-07-03 with new spots"), // serp ISO pattern
    ("m11", None, "https://blog.example.net/d/15-03-2023",
      "day first")) // url_inference (day-first)

  /** Parsed single-GET/HEAD artifacts: (mention_id, jsonld_date, og_date,
    * meta_date, last_modified) — absent artifact = null. */
  val pageMeta: Seq[(String, Option[String], Option[String], Option[String], Option[String])] = Seq(
    ("m01", Some("2024-02-01"), None, None, None),
    ("m02", None, Some("2024-04-01"), None, None),
    ("m03", Some("2024-05-01"), Some("2024-04-01"), None, None),
    ("m04", None, Some("2024-04-11"), Some("2024-04-12"), None),
    ("m05", None, None, Some("2024-01-20"), Some("2024-01-25")),
    ("m07", None, None, None, Some("2023-11-05")),
    ("m09", None, None, Some("2031-01-01"), Some("2023-01-10")))

  /** RSS feed entries per source: (source_id, link, published). */
  val rssEntries: Seq[(String, String, String)] = Seq(
    ("lefooding", "https://www.lefooding.com/a/rss-covered", "2024-03-20"),
    ("lefooding", "https://www.lefooding.com/a/other-article", "2024-03-21"),
    ("timeout", "https://www.timeout.fr/a/unrelated", "2024-02-02"))

  def mentionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mentions.toDF("mention_id", "source_id", "url", "snippet")
  }

  def pageMetaDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pageMeta.toDF("mention_id", "jsonld_date", "og_date", "meta_date", "last_modified")
      .select(col("mention_id"), col("jsonld_date").cast("date"),
        col("og_date").cast("date"), col("meta_date").cast("date"),
        col("last_modified").cast("date"))
  }

  def rssDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rssEntries.toDF("source_id", "link", "published")
      .select(col("source_id"), col("link"), col("published").cast("date"))
  }

  // ------------------------------------------------------------ expressions

  /** null unless inside the reference validation window. */
  private def valid(d: Column): Column =
    when(d >= lit(validFrom).cast("date") && d <= lit(validTo).cast("date"), d)

  private def monthNum(m: Column): Column =
    when(m === "jan", 1).when(m === "feb", 2).when(m === "mar", 3)
      .when(m === "apr", 4).when(m === "may", 5).when(m === "jun", 6)
      .when(m === "jul", 7).when(m === "aug", 8).when(m === "sep", 9)
      .when(m === "oct", 10).when(m === "nov", 11).otherwise(12)

  /** SERP snippet patterns in the reference's order (date_enricher.py:83-87)
    * and URL patterns (date_enricher.py:270-275). Each pattern's FULL first
    * match is staged as its own column by [[enrich]] (one scan of the long
    * source string per pattern); the date builders below then pull the
    * capture groups out of the ≤12-char match string. The r20 form embedded
    * `regexp_extract(source, pat, g)` once per group PLUS the non-empty
    * guard — 4 scans of the snippet/url per pattern, 28 per row across the
    * cascade (guide §1.2 step 2: per-task work). Group extraction from the
    * staged match is exact: the match string is the leftmost match, so
    * re-matching the same pattern against it at position 0 reproduces the
    * identical greedy group decomposition. */
  private val pSerpA = "(\\d{1,2})\\s+(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\\s+(20\\d{2})"
  private val pSerpB = "(20\\d{2})-(\\d{2})-(\\d{2})"
  private val pSerpC = "(\\d{1,2})/(\\d{1,2})/(20\\d{2})"
  private val pUrl1 = "/(20\\d{2})/(\\d{1,2})/(\\d{1,2})/"
  private val pUrl2 = "/(20\\d{2})-(\\d{2})-(\\d{2})"
  private val pUrl3 = "/(\\d{1,2})-(\\d{1,2})-(20\\d{2})"
  private val pUrl4 = "[?&]date=(20\\d{2})-(\\d{2})-(\\d{2})"

  /** serp date from the three staged full-match columns (year-month-day
    * group positions vary per pattern, as in the reference). */
  private def serpDateFrom(mA: Column, mB: Column, mC: Column): Column = {
    val a = when(mA =!= "",
      make_date(regexp_extract(mA, pSerpA, 3).cast("int"),
        monthNum(regexp_extract(mA, pSerpA, 2)), regexp_extract(mA, pSerpA, 1).cast("int")))
    val b = when(mB =!= "",
      make_date(regexp_extract(mB, pSerpB, 1).cast("int"),
        regexp_extract(mB, pSerpB, 2).cast("int"), regexp_extract(mB, pSerpB, 3).cast("int")))
    val c = when(mC =!= "",
      make_date(regexp_extract(mC, pSerpC, 3).cast("int"),
        regexp_extract(mC, pSerpC, 2).cast("int"), regexp_extract(mC, pSerpC, 1).cast("int")))
    coalesce(valid(a), valid(b), valid(c))
  }

  /** url-inferred date from the four staged full-match columns. */
  private def urlDateFrom(m1: Column, m2: Column, m3: Column, m4: Column): Column = {
    val d1 = when(m1 =!= "",
      make_date(regexp_extract(m1, pUrl1, 1).cast("int"),
        regexp_extract(m1, pUrl1, 2).cast("int"), regexp_extract(m1, pUrl1, 3).cast("int")))
    val d2 = when(m2 =!= "",
      make_date(regexp_extract(m2, pUrl2, 1).cast("int"),
        regexp_extract(m2, pUrl2, 2).cast("int"), regexp_extract(m2, pUrl2, 3).cast("int")))
    val d3 = when(m3 =!= "",
      make_date(regexp_extract(m3, pUrl3, 3).cast("int"),
        regexp_extract(m3, pUrl3, 2).cast("int"), regexp_extract(m3, pUrl3, 1).cast("int")))
    val d4 = when(m4 =!= "",
      make_date(regexp_extract(m4, pUrl4, 1).cast("int"),
        regexp_extract(m4, pUrl4, 2).cast("int"), regexp_extract(m4, pUrl4, 3).cast("int")))
    coalesce(valid(d1), valid(d2), valid(d3), valid(d4))
  }

  /** Full S8 cascade over mentions ⋈ page_meta ⋈ rss. */
  def enrich(mentions: DataFrame, pageMeta: DataFrame, rss: DataFrame): DataFrame = {
    val joined = mentions
      .join(broadcast(pageMeta), Seq("mention_id"), "left")
      .join(broadcast(rss),
        mentions("source_id") === rss("source_id") && mentions("url") === rss("link"), "left")
      .drop(rss("source_id"))
    // STAGE in three Project levels: (1) the lowercased snippet, (2) each
    // pattern's FULL first match (one scan of the long string per pattern —
    // see the pattern scaladoc above), (3) the seven candidate dates, from
    // which method/confidence/published derive. Each staged alias is
    // non-cheap and referenced more than once, so CollapseProject keeps
    // every level evaluated once per row (the r20 two-level form measured
    // ~3× on the 150k-row volume variant; match staging removes another
    // ~4× of long-string regex scans).
    val lowered = joined.select(col("mention_id"), col("url"),
      lower(col("snippet")).as("s_lc"),
      col("published"), col("jsonld_date"), col("og_date"), col("meta_date"),
      col("last_modified"))
    val matches = lowered.select(col("mention_id"),
      regexp_extract(col("s_lc"), pSerpA, 0).as("m_sa"),
      regexp_extract(col("s_lc"), pSerpB, 0).as("m_sb"),
      regexp_extract(col("s_lc"), pSerpC, 0).as("m_sc"),
      regexp_extract(col("url"), pUrl1, 0).as("m_u1"),
      regexp_extract(col("url"), pUrl2, 0).as("m_u2"),
      regexp_extract(col("url"), pUrl3, 0).as("m_u3"),
      regexp_extract(col("url"), pUrl4, 0).as("m_u4"),
      col("published"), col("jsonld_date"), col("og_date"), col("meta_date"),
      col("last_modified"))
    val staged = matches.select(col("mention_id"),
      serpDateFrom(col("m_sa"), col("m_sb"), col("m_sc")).as("d_serp"),
      valid(col("published")).as("d_rss"),
      valid(col("jsonld_date")).as("d_jsonld"),
      valid(col("og_date")).as("d_og"),
      valid(col("meta_date")).as("d_meta"),
      urlDateFrom(col("m_u1"), col("m_u2"), col("m_u3"), col("m_u4")).as("d_url"),
      valid(col("last_modified")).as("d_lastmod"))
    val method = when(col("d_serp").isNotNull, "serp")
      .when(col("d_rss").isNotNull, "rss")
      .when(col("d_jsonld").isNotNull, "schema_org")
      .when(col("d_og").isNotNull, "opengraph")
      .when(col("d_meta").isNotNull, "meta_article")
      .when(col("d_url").isNotNull, "url_inference")
      .when(col("d_lastmod").isNotNull, "http_last_modified")
      .otherwise("unknown")
    val confidence = when(col("d_serp").isNotNull, "low")
      .when(col("d_rss").isNotNull, "high")
      .when(col("d_jsonld").isNotNull, "high")
      .when(col("d_og").isNotNull, "medium")
      .when(col("d_meta").isNotNull, "medium")
      .when(col("d_url").isNotNull, "low")
      .when(col("d_lastmod").isNotNull, "low")
    staged.select(col("mention_id"),
      date_format(coalesce(col("d_serp"), col("d_rss"), col("d_jsonld"), col("d_og"),
        col("d_meta"), col("d_url"), col("d_lastmod")), "yyyy-MM-dd")
        .as("published_date"),
      confidence.as("confidence"),
      method.as("method"))
  }

  // ------------------------------------------------------- declared queries

  def qDatePrecedence(spark: SparkSession, dir: String): DataFrame =
    enrich(mentionsDf(spark), pageMetaDf(spark), rssDf(spark))

  /** J6 — mention ⋈ RSS feed entries on (source catalog feed, exact link)
    * (date_enricher.py:117-126). */
  def qRssJoin(spark: SparkSession, dir: String): DataFrame = {
    val mn = mentionsDf(spark)
    val rss = rssDf(spark)
    mn.join(broadcast(rss),
        mn("source_id") === rss("source_id") && mn("url") === rss("link"))
      .select(col("mention_id"), col("link"),
        date_format(col("published"), "yyyy-MM-dd").as("rss_published"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s8_date_precedence" -> (qDatePrecedence _),
    "s8_date_precedence_vol" -> (qDatePrecedenceVol _),
    "j6_rss_feed_join" -> (qRssJoin _))

  // ------------------------------------------------------------ oracle SQL

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
  private def opt(s: Option[String], asDate: Boolean = false): String =
    s.map(v => if (asDate) s"DATE '$v'" else sqlStr(v))
      .getOrElse(if (asDate) "CAST(NULL AS DATE)" else "CAST(NULL AS VARCHAR)")

  private def mentionValues: String = mentions.map { case (id, sid, url, sn) =>
    s"(${sqlStr(id)}, ${opt(sid)}, ${sqlStr(url)}, ${sqlStr(sn)})"
  }.mkString("(VALUES ", ", ", ")") + " AS mn(mention_id, source_id, url, snippet)"

  private def pageMetaValues: String = pageMeta.map { case (id, j, o, m, lm) =>
    s"(${sqlStr(id)}, ${opt(j, asDate = true)}, ${opt(o, asDate = true)}, ${opt(m, asDate = true)}, ${opt(lm, asDate = true)})"
  }.mkString("(VALUES ", ", ", ")") +
    " AS pm(mention_id, jsonld_date, og_date, meta_date, last_modified)"

  private def rssValues: String = rssEntries.map { case (sid, link, p) =>
    s"(${sqlStr(sid)}, ${sqlStr(link)}, DATE '$p')"
  }.mkString("(VALUES ", ", ", ")") + " AS rss(source_id, link, published)"

  private def vSql(e: String) =
    s"CASE WHEN $e >= DATE '$validFrom' AND $e <= DATE '$validTo' THEN $e END"

  private val monthSql =
    "CASE ? WHEN 'jan' THEN 1 WHEN 'feb' THEN 2 WHEN 'mar' THEN 3 WHEN 'apr' THEN 4" +
      " WHEN 'may' THEN 5 WHEN 'jun' THEN 6 WHEN 'jul' THEN 7 WHEN 'aug' THEN 8" +
      " WHEN 'sep' THEN 9 WHEN 'oct' THEN 10 WHEN 'nov' THEN 11 ELSE 12 END"

  private def serpSql: String = {
    val pA = "(\\d{1,2})\\s+(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)\\s+(20\\d{2})"
    val pB = "(20\\d{2})-(\\d{2})-(\\d{2})"
    val pC = "(\\d{1,2})/(\\d{1,2})/(20\\d{2})"
    val mA = monthSql.replace("?", s"regexp_extract(lower(snippet), '$pA', 2)")
    val a = s"CASE WHEN regexp_extract(lower(snippet), '$pA', 3) != '' THEN " +
      s"make_date(CAST(regexp_extract(lower(snippet), '$pA', 3) AS INTEGER), $mA, " +
      s"CAST(regexp_extract(lower(snippet), '$pA', 1) AS INTEGER)) END"
    val b = s"CASE WHEN regexp_extract(lower(snippet), '$pB', 1) != '' THEN " +
      s"make_date(CAST(regexp_extract(lower(snippet), '$pB', 1) AS INTEGER), " +
      s"CAST(regexp_extract(lower(snippet), '$pB', 2) AS INTEGER), " +
      s"CAST(regexp_extract(lower(snippet), '$pB', 3) AS INTEGER)) END"
    val c = s"CASE WHEN regexp_extract(lower(snippet), '$pC', 3) != '' THEN " +
      s"make_date(CAST(regexp_extract(lower(snippet), '$pC', 3) AS INTEGER), " +
      s"CAST(regexp_extract(lower(snippet), '$pC', 2) AS INTEGER), " +
      s"CAST(regexp_extract(lower(snippet), '$pC', 1) AS INTEGER)) END"
    s"coalesce(${vSql(s"($a)")}, ${vSql(s"($b)")}, ${vSql(s"($c)")})"
  }

  private def urlSql: String = {
    val p1 = "/(20\\d{2})/(\\d{1,2})/(\\d{1,2})/"
    val p2 = "/(20\\d{2})-(\\d{2})-(\\d{2})"
    val p3 = "/(\\d{1,2})-(\\d{1,2})-(20\\d{2})"
    val p4 = "[?&]date=(20\\d{2})-(\\d{2})-(\\d{2})"
    def yearFirst(p: String) =
      s"CASE WHEN regexp_extract(url, '$p', 1) != '' THEN " +
        s"make_date(CAST(regexp_extract(url, '$p', 1) AS INTEGER), " +
        s"CAST(regexp_extract(url, '$p', 2) AS INTEGER), " +
        s"CAST(regexp_extract(url, '$p', 3) AS INTEGER)) END"
    val d3 = s"CASE WHEN regexp_extract(url, '$p3', 3) != '' THEN " +
      s"make_date(CAST(regexp_extract(url, '$p3', 3) AS INTEGER), " +
      s"CAST(regexp_extract(url, '$p3', 2) AS INTEGER), " +
      s"CAST(regexp_extract(url, '$p3', 1) AS INTEGER)) END"
    s"coalesce(${vSql(s"(${yearFirst(p1)})")}, ${vSql(s"(${yearFirst(p2)})")}, " +
      s"${vSql(s"($d3)")}, ${vSql(s"(${yearFirst(p4)})")})"
  }

  /** The s8 oracle body, parameterized over the three relation sources (must
    * be aliased mn/pm/rss with the fixture column names) so the sf-scale
    * volume variant reuses the proven cascade SQL. */
  private def precedenceSqlFrom(mnSrc: String, pmSrc: String, rssSrc: String): String =
    s"""WITH j AS (
       |  SELECT mn.*, pm.jsonld_date, pm.og_date, pm.meta_date, pm.last_modified,
       |    rss.published
       |  FROM $mnSrc
       |  LEFT JOIN $pmSrc ON pm.mention_id = mn.mention_id
       |  LEFT JOIN $rssSrc ON rss.source_id = mn.source_id AND rss.link = mn.url),
         |cascaded AS (
         |  SELECT mention_id,
         |    $serpSql AS serp_d,
         |    ${vSql("published")} AS rss_d,
         |    ${vSql("jsonld_date")} AS jsonld_d,
         |    ${vSql("og_date")} AS og_d,
         |    ${vSql("meta_date")} AS meta_d,
         |    $urlSql AS url_d,
         |    ${vSql("last_modified")} AS lm_d
         |  FROM j)
         |SELECT mention_id,
         |  strftime(coalesce(serp_d, rss_d, jsonld_d, og_d, meta_d, url_d, lm_d),
         |    '%Y-%m-%d') AS published_date,
         |  CASE WHEN serp_d IS NOT NULL THEN 'low'
         |       WHEN rss_d IS NOT NULL THEN 'high'
         |       WHEN jsonld_d IS NOT NULL THEN 'high'
         |       WHEN og_d IS NOT NULL THEN 'medium'
         |       WHEN meta_d IS NOT NULL THEN 'medium'
         |       WHEN url_d IS NOT NULL THEN 'low'
         |       WHEN lm_d IS NOT NULL THEN 'low' END AS confidence,
         |  CASE WHEN serp_d IS NOT NULL THEN 'serp'
         |       WHEN rss_d IS NOT NULL THEN 'rss'
         |       WHEN jsonld_d IS NOT NULL THEN 'schema_org'
         |       WHEN og_d IS NOT NULL THEN 'opengraph'
         |       WHEN meta_d IS NOT NULL THEN 'meta_article'
         |       WHEN url_d IS NOT NULL THEN 'url_inference'
         |       WHEN lm_d IS NOT NULL THEN 'http_last_modified'
         |       ELSE 'unknown' END AS method
         |FROM cascaded""".stripMargin

  // ------------------------------------------------- sf-scale volume variant

  /** Derivation formulas shared (textually) by both engines: urls/snippets/
    * artifact dates synthesized from o_orderkey with identical integer
    * arithmetic and concatenation, so the cascade runs on 15k+ mentions with
    * a full DuckDB oracle. */
  private object Vol {
    import org.apache.spark.sql.functions._

    val urlSql = "'https://site' || CAST(o_orderkey % 5 AS VARCHAR) || '.com' || " +
      "CASE WHEN o_orderkey % 9 = 0 THEN '/2024/03/' || CAST(o_orderkey % 28 + 1 AS VARCHAR) || '/' " +
      "ELSE '/p/' || CAST(o_orderkey AS VARCHAR) END"
    def urlCol: Column = concat(lit("https://site"), (col("o_orderkey") % 5).cast("string"),
      lit(".com"),
      when(col("o_orderkey") % 9 === 0,
        concat(lit("/2024/03/"), (col("o_orderkey") % 28 + 1).cast("string"), lit("/")))
        .otherwise(concat(lit("/p/"), col("o_orderkey").cast("string"))))

    val sourceSql = "CASE WHEN o_orderkey % 4 = 0 THEN 'lefooding' " +
      "WHEN o_orderkey % 4 = 1 THEN 'timeout' WHEN o_orderkey % 4 = 3 THEN 'michelin' END"
    def sourceCol: Column = when(col("o_orderkey") % 4 === 0, "lefooding")
      .when(col("o_orderkey") % 4 === 1, "timeout")
      .when(col("o_orderkey") % 4 === 3, "michelin")

    val snippetSql = "CASE WHEN o_orderkey % 7 = 0 THEN 'published ' || " +
      "CAST(o_orderkey % 28 + 1 AS VARCHAR) || ' mar 2024' " +
      "WHEN o_orderkey % 7 = 1 THEN 'updated 2024-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR) || '-15 today' " +
      "ELSE 'no date in this snippet' END"
    def snippetCol: Column = when(col("o_orderkey") % 7 === 0,
        concat(lit("published "), (col("o_orderkey") % 28 + 1).cast("string"), lit(" mar 2024")))
      .when(col("o_orderkey") % 7 === 1,
        concat(lit("updated 2024-0"), (col("o_orderkey") % 9 + 1).cast("string"), lit("-15 today")))
      .otherwise("no date in this snippet")
  }

  def mentionsVol(spark: SparkSession, dir: String): DataFrame =
    // fanned before the regex cascade in enrich(): the broadcast joins keep
    // the mentions side's partitioning, so the 7-pattern scan chain runs at
    // session width instead of on the single scan task (opt guide §2.5)
    graft.Tables.fanOut(graft.Tables.orders(spark, dir), col("o_orderkey")).select(
      col("o_orderkey").cast("string").as("mention_id"),
      Vol.sourceCol.as("source_id"),
      Vol.urlCol.as("url"),
      Vol.snippetCol.as("snippet"))

  def pageMetaVol(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        col("o_orderkey").cast("string").as("mention_id"),
        when(col("o_orderkey") % 11 === 0, lit("2031-01-01").cast("date"))
          .when(col("o_orderkey") % 2 === 0,
            date_add(lit("2024-01-01").cast("date"), (col("o_orderkey") % 400).cast("int")))
          .as("jsonld_date"),
        when(col("o_orderkey") % 5 === 0,
          date_add(lit("2024-02-01").cast("date"), (col("o_orderkey") % 100).cast("int")))
          .as("og_date"),
        when(col("o_orderkey") % 4 === 0,
          date_add(lit("2023-06-01").cast("date"), (col("o_orderkey") % 200).cast("int")))
          .as("meta_date"),
        when(col("o_orderkey") % 2 === 1,
          date_add(lit("2022-01-01").cast("date"), (col("o_orderkey") % 300).cast("int")))
          .as("last_modified"))

  def rssVol(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      // %9 != 0 keeps only the '/p/<orderkey>' urls, which are UNIQUE — the
      // date-pattern urls collide across orderkeys and would fan one mention
      // out to many feed entries (enrich() is one row per mention)
      .filter(col("o_orderkey") % 6 === 0 && col("o_orderkey") % 9 =!= 0)
      .select(Vol.sourceCol.as("source_id"), Vol.urlCol.as("link"),
        to_date(col("o_orderdate")).as("published"))
      .filter(col("source_id").isNotNull)

  def qDatePrecedenceVol(spark: SparkSession, dir: String): DataFrame =
    enrich(mentionsVol(spark, dir), pageMetaVol(spark, dir), rssVol(spark, dir))

  private val mentionVolSql =
    s"""(SELECT CAST(o_orderkey AS VARCHAR) AS mention_id,
       |   ${Vol.sourceSql} AS source_id,
       |   ${Vol.urlSql} AS url,
       |   ${Vol.snippetSql} AS snippet
       | FROM orders) AS mn""".stripMargin

  private val pageMetaVolSql =
    """(SELECT CAST(o_orderkey AS VARCHAR) AS mention_id,
      |   CASE WHEN o_orderkey % 11 = 0 THEN DATE '2031-01-01'
      |        WHEN o_orderkey % 2 = 0 THEN DATE '2024-01-01' + CAST(o_orderkey % 400 AS INTEGER) END AS jsonld_date,
      |   CASE WHEN o_orderkey % 5 = 0 THEN DATE '2024-02-01' + CAST(o_orderkey % 100 AS INTEGER) END AS og_date,
      |   CASE WHEN o_orderkey % 4 = 0 THEN DATE '2023-06-01' + CAST(o_orderkey % 200 AS INTEGER) END AS meta_date,
      |   CASE WHEN o_orderkey % 2 = 1 THEN DATE '2022-01-01' + CAST(o_orderkey % 300 AS INTEGER) END AS last_modified
      | FROM orders WHERE o_orderkey % 3 = 0) AS pm""".stripMargin

  private val rssVolSql =
    s"""(SELECT * FROM (SELECT ${Vol.sourceSql} AS source_id,
       |   ${Vol.urlSql} AS link,
       |   CAST(o_orderdate AS DATE) AS published
       | FROM orders WHERE o_orderkey % 6 = 0 AND o_orderkey % 9 != 0)
       | WHERE source_id IS NOT NULL) AS rss""".stripMargin

  val oracles: Map[String, String] = Map(
    "s8_date_precedence" ->
      precedenceSqlFrom(mentionValues, pageMetaValues, rssValues),
    "s8_date_precedence_vol" ->
      precedenceSqlFrom(mentionVolSql, pageMetaVolSql, rssVolSql),
    "j6_rss_feed_join" ->
      s"""SELECT mention_id, link, strftime(published, '%Y-%m-%d') AS rss_published
         |FROM $mentionValues
         |JOIN $rssValues ON rss.source_id = mn.source_id AND rss.link = mn.url""".stripMargin)
}
