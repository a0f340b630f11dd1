package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.TextAlgo

/** Mention scoring + decision (SURVEY §2.8; reference:
  * mention_scanner/scoring.py:61-179, city_profiles.py:93-236,
  * utils/database.py:585-734 for the catalog resolution J2, scanner.py:768-787
  * for the P6 exclusion filter).
  *
  * Whole tree is ONE select of column expressions over the candidate set with
  * the source catalog broadcast — no per-candidate lookups. Geo/authority/
  * penalty/decision arithmetic is oracle-checked; the name-match component is
  * a fixture input here because its expressions (trigram/fuzzy) are custom —
  * they are pinned by TextAlgoSpec and exercised in mention_name_scores.
  */
object MentionScoring {

  import Fixtures.ParisProfile

  /** Resolved catalog rows: (ord, source_id, domain, type, authority_weight). */
  lazy val resolvedCatalog: Seq[(Int, String, String, String, Double)] =
    Fixtures.catalog.zipWithIndex.map { case ((sid, base, t, aw, _), i) =>
      (i, sid, TextAlgo.domainOf(base, null, null), t, aw)
    }

  private def catalogResolvedDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    resolvedCatalog.toDF("ord", "source_id", "cat_domain", "cat_type", "cat_authority")
  }

  private def catalogResolvedValues: String =
    resolvedCatalog.map { case (o, sid, d, t, aw) =>
      s"($o, '$sid', '$d', '$t', CAST($aw AS DOUBLE))"
    }.mkString("(VALUES ", ", ", ")") +
      " AS cat(ord, source_id, cat_domain, cat_type, cat_authority)"

  // ----------------------------------------------------------- geo signals

  /** Geo score as the SUM of detected signal components — NOT clamped to 1,
    * matching the reference (city_profiles.py:228: plain sum). */
  def geoScore(title: Column, snippet: Column, url: Column,
      poiLat: Column, poiLng: Column): Column = {
    val t = lower(title)
    val s = lower(snippet)
    val u = lower(url)
    val city = ParisProfile.aliases
      .map(a => t.contains(lit(a)) || s.contains(lit(a)))
      .reduce(_ || _)
    // ONE fused alternation per field instead of one rlike per (prefix,
    // field): rlike is "contains a match", so the alternation of the prefix
    // patterns accepts exactly the union of the per-prefix languages —
    // identical boolean, a third of the regex scans (guide §1.2 step 2).
    val postalRe = ParisProfile.postalPrefixes.map(p => s"\\b$p\\d{1,3}\\b").mkString("|")
    val postal = t.rlike(postalRe) || s.rlike(postalRe) || u.rlike(postalRe)
    val admin = ParisProfile.adminNames
      .map(a => t.contains(lit(a)) || s.contains(lit(a)))
      .reduce(_ || _)
    val country = ParisProfile.countryIndicators
      .map(i => t.contains(lit(i)) || s.contains(lit(i)))
      .reduce(_ || _)
    val urlSeg = ParisProfile.aliases
      .map(a => u.contains(lit(s"/$a/")) || u.contains(lit(s"/$a-")) || u.endsWith(lit(s"/$a")))
      .reduce(_ || _)
    val distKm = graft.expr.functions.haversine_meters(
      poiLat, poiLng, lit(ParisProfile.centroidLat), lit(ParisProfile.centroidLng)) / 1000.0
    val dist = when(distKm < 3.0, 0.3).when(distKm < 15.0, 0.15).otherwise(0.0)
    when(city, 0.4).otherwise(0.0) +
      when(postal, 0.3).otherwise(0.0) +
      when(admin, 0.2).otherwise(0.0) +
      when(country, 0.1).otherwise(0.0) +
      when(urlSeg, 0.3).otherwise(0.0) +
      dist
  }

  /** Country-mismatch hard penalty over title+snippet+url (scoring.py:282-345;
    * city-mismatch is structurally dead in the reference — profiles carry no
    * competing_cities — so total = country only). */
  def countryMismatch(title: Column, snippet: Column, url: Column): Column = {
    val text = lower(concat_ws(" ", title, snippet, url))
    // fused alternation — one scan of the concatenated text instead of six
    // (union-of-languages identity, same as the postal fuse above)
    text.rlike(ParisProfile.countryMismatchPatterns.mkString("|"))
  }

  // --------------------------------------------------- J2 catalog resolution

  /** Resolve candidate domains to catalog sources: exact (www-stripped) match,
    * else suffix match either direction (first catalog row wins), else the
    * unknown/generic source, else lowest-authority press
    * (utils/database.py:617-731).
    *
    * The catalog is MODEL-SIZED (7 rows), so resolution is a pure
    * projection: one first-hit conditional chain over the catalog in ord
    * order — exact tiers before suffix tiers — folded with `coalesce`.
    * The r20 form joined a broadcast catalog twice and then ranked suffix
    * matches with a row_number window partitioned by cand_id: one full
    * shuffle + sort of the candidate set purely to pick the first of ≤7
    * broadcast rows (optimization guide §2.4 — remove shuffles outright).
    * Semantically identical per row (callers all carry unique cand_ids, so
    * the old window kept exactly one row per input row), and it is the
    * same per-row scalar resolution the DuckDB oracle replays with its
    * correlated `ORDER BY ord LIMIT 1` subqueries. Candidates now never
    * shuffle at all. */
  def resolveAuthority(cands: DataFrame, spark: SparkSession): DataFrame = {
    val cat = resolvedCatalog // ord-ascending by construction
    val unknownSid = cat.find(c => Seq("unknown", "generic", "other").contains(c._4.toLowerCase))
      .map(c => (c._2, c._5))
    val pressFallback = cat.filter(_._4.toLowerCase == "press")
      .sortBy(c => (c._5, c._1)).headOption.map(c => (c._2, c._5))
    val fallback = unknownSid.orElse(pressFallback)

    val d = regexp_replace(lower(col("domain")), "www\\.", "")
    // staged: norm_domain is non-cheap and referenced by every tier below,
    // so CollapseProject keeps it evaluated once per row
    val withD = cands.withColumn("norm_domain", d)
    val nd = col("norm_domain")
    def hit(sid: String, aw: Double): Column =
      struct(lit(sid).as("sid"), lit(aw).as("auth"))
    val exactTiers = cat.map { case (_, sid, dom, _, aw) =>
      when(nd === lit(dom), hit(sid, aw))
    }
    val suffixTiers = cat.map { case (_, sid, dom, _, aw) =>
      when(nd.endsWith(lit(dom)) || lit(dom).endsWith(nd), hit(sid, aw))
    }
    val fb = struct(lit(fallback.map(_._1).orNull).as("sid"),
      lit(fallback.map(_._2).getOrElse(0.5)).as("auth"))
    // staged for the same reason: the chain is evaluated once, both fields
    // read from the one struct
    withD.withColumn("j2_hit", coalesce(exactTiers ++ suffixTiers :+ fb: _*))
      .withColumn("resolved_source_id", col("j2_hit.sid"))
      .withColumn("authority", col("j2_hit.auth"))
      .drop("j2_hit")
  }

  // ------------------------------------------------------------- full tree

  /** P6 exclusion + §2.8 score + decision over a candidate DataFrame.
    * `timeDecay=true` enables the optional exponential decay on published_at
    * (scoring.py:348-387: exp(-age/90), 0 past 365 days, no-op when the date
    * is absent; disabled by default per config_resolver.py:145-149 — the
    * engine follows the executed default but ships the real path). */
  def scoreAndDecide(cands: DataFrame, spark: SparkSession,
      timeDecay: Boolean = false, asOf: String = Fixtures.asOf): DataFrame = {
    val excluded = Fixtures.excludedDomains
    val filtered = cands.filter(!lower(col("domain")).isin(excluded: _*))
    val withAuth = resolveAuthority(filtered, spark)

    val geo = geoScore(col("title"), col("snippet"), col("url"), col("poi_lat"), col("poi_lng"))
    val pen = when(countryMismatch(col("title"), col("snippet"), col("url")), 1.0).otherwise(0.0)
    val base = lit(0.60) * col("name_match") + lit(0.25) * col("g") + lit(0.15) * col("authority")
    val decayMult =
      if (!timeDecay) lit(1.0)
      else {
        val age = datediff(to_date(to_timestamp(lit(asOf))), to_date(col("published_at"))).cast("double")
        when(col("published_at").isNull, 1.0)
          .when(age > 365.0, 0.0)
          .otherwise(least(greatest(exp(age / -90.0), lit(0.0)), lit(1.0)))
      }
    val fin = least(greatest(base - col("penalty"), lit(0.0)), lit(1.0)) * decayMult

    val scored = withAuth
      .withColumn("g", geo)
      .withColumn("penalty", pen)
      .withColumn("base_score", base)
      .withColumn("final_score", fin)

    val decision = when(col("authority") >= 1.0 && col("penalty") === 0.0, "ACCEPT")
      .when(col("penalty") > 0.0, "REJECT")
      .when(col("final_score") >= 0.35, "ACCEPT")
      .when(col("final_score") >= 0.20 && (col("g") >= 0.25 || col("authority") >= 0.60), "REVIEW")
      .otherwise("REJECT")
    val acceptedBy = when(col("authority") >= 1.0 && col("penalty") === 0.0, "confirmed_domain")
      .when(col("penalty") > 0.0, "")
      .when(col("final_score") >= 0.35, "score_high")
      .when(col("final_score") >= 0.20 && (col("g") >= 0.25 || col("authority") >= 0.60), "mid_conditional")
      .otherwise("")

    scored.select(
      col("cand_id"), col("poi_id"), col("resolved_source_id"),
      round(col("name_match"), 6).as("name_match"),
      round(col("g"), 6).as("geo_score"),
      round(col("authority"), 6).as("authority"),
      round(col("penalty"), 6).as("penalty_total"),
      round(col("base_score"), 6).as("base_score"),
      round(col("final_score"), 6).as("final_score"),
      decision.as("decision"),
      acceptedBy.as("accepted_by"))
  }

  // ------------------------------------------------------- declared queries

  def qMentionScoreDecision(spark: SparkSession, dir: String): DataFrame =
    scoreAndDecide(Fixtures.serpCandidatesDf(spark), spark)

  /** Name-matching expressions over the same candidates (custom expressions →
    * rows-only driver check; semantics pinned by TextAlgoSpec). */
  def qMentionNameScores(spark: SparkSession, dir: String): DataFrame = {
    import graft.expr.{functions => F}
    Fixtures.serpCandidatesDf(spark).select(
      col("cand_id"),
      F.normalize_text(col("poi_name")).as("poi_norm"),
      round(F.trigram_similarity(col("poi_name"), concat_ws(" ", col("title"), col("snippet"))), 6).as("trigram"),
      round(F.fuzzy_ratio(lower(col("poi_name")), lower(concat_ws(" ", col("title"), col("snippet")))), 6).as("fuzzy"),
      round(F.name_score(col("poi_name"), concat_ws(" ", col("title"), col("snippet"))), 6).as("name_score"),
      F.dedupe_key(col("url")).as("dedupe_key"),
      F.apex_domain(col("domain")).as("apex"))
  }

  def qMentionScoreDecayed(spark: SparkSession, dir: String): DataFrame =
    scoreAndDecide(Fixtures.serpCandidatesDf(spark), spark, timeDecay = true)

  /** The hash-pinnable subset of [[qMentionNameScores]]: normalization,
    * trigram similarity, and apex extraction all replay in DuckDB (via the
    * TextAlgo oracle-SQL generators), so only the genuinely
    * non-SQL-expressible fuzzy (Ratcliff-Obershelp) component stays in the
    * rows-only query. */
  def qMentionTrigramScores(spark: SparkSession, dir: String): DataFrame = {
    import graft.expr.{functions => F}
    Fixtures.serpCandidatesDf(spark).select(
      col("cand_id"),
      F.normalize_text(col("poi_name")).as("poi_norm"),
      round(F.trigram_similarity(col("poi_name"), concat_ws(" ", col("title"), col("snippet"))), 6).as("trigram"),
      F.apex_domain(col("domain")).as("apex"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mention_score_decision" -> (qMentionScoreDecision _),
    "mention_score_decayed" -> (qMentionScoreDecayed _),
    "mention_name_scores" -> (qMentionNameScores _),
    "mention_trigram_scores" -> (qMentionTrigramScores _))

  private def geoSqlExpr: String = {
    def containsAny(col: String, vals: Seq[String]) =
      vals.map(v => s"contains($col, '${v.replace("'", "''")}')").mkString("(", " OR ", ")")
    val city = containsAny("lower(title)", ParisProfile.aliases) +
      " OR " + containsAny("lower(snippet)", ParisProfile.aliases)
    val postal = ParisProfile.postalPrefixes.map { p =>
      s"regexp_matches(lower(title), '\\b$p\\d{1,3}\\b') OR regexp_matches(lower(snippet), '\\b$p\\d{1,3}\\b') OR regexp_matches(lower(url), '\\b$p\\d{1,3}\\b')"
    }.mkString("(", " OR ", ")")
    val admin = containsAny("lower(title)", ParisProfile.adminNames) +
      " OR " + containsAny("lower(snippet)", ParisProfile.adminNames)
    val country = containsAny("lower(title)", ParisProfile.countryIndicators) +
      " OR " + containsAny("lower(snippet)", ParisProfile.countryIndicators)
    val urlSeg = ParisProfile.aliases.map { a =>
      s"contains(lower(url), '/$a/') OR contains(lower(url), '/$a-') OR lower(url) LIKE '%/$a'"
    }.mkString("(", " OR ", ")")
    val dist =
      s"""6371.0 * 2.0 * atan2(
         |  sqrt(pow(sin(radians(${ParisProfile.centroidLat} - poi_lat) / 2), 2)
         |    + cos(radians(poi_lat)) * cos(radians(${ParisProfile.centroidLat}))
         |    * pow(sin(radians(${ParisProfile.centroidLng} - poi_lng) / 2), 2)),
         |  sqrt(1.0 - (pow(sin(radians(${ParisProfile.centroidLat} - poi_lat) / 2), 2)
         |    + cos(radians(poi_lat)) * cos(radians(${ParisProfile.centroidLat}))
         |    * pow(sin(radians(${ParisProfile.centroidLng} - poi_lng) / 2), 2))))""".stripMargin
    s"""(CASE WHEN ($city) THEN 0.4 ELSE 0.0 END
       | + CASE WHEN ($postal) THEN 0.3 ELSE 0.0 END
       | + CASE WHEN ($admin) THEN 0.2 ELSE 0.0 END
       | + CASE WHEN ($country) THEN 0.1 ELSE 0.0 END
       | + CASE WHEN ($urlSeg) THEN 0.3 ELSE 0.0 END
       | + CASE WHEN ($dist) < 3.0 THEN 0.3 WHEN ($dist) < 15.0 THEN 0.15 ELSE 0.0 END)""".stripMargin
  }

  private def oracleSqlDecision: String = oracleSqlDecisionImpl(false)

  /** Oracle decision tree, parameterized over the candidate relation (must be
    * aliased `cand` with the fixture column names) so the sf-scale volume
    * variant reuses the proven SQL. */
  private[domain] def oracleSqlDecisionImpl(decay: Boolean,
      candSrc: String = Fixtures.serpCandidateValues): String = {
    val mismatch = ParisProfile.countryMismatchPatterns
      .map(p => s"regexp_matches(lower(concat_ws(' ', title, snippet, url)), '$p')")
      .mkString("(", " OR ", ")")
    val excl = Fixtures.excludedDomains.map(d => s"'$d'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT cand.*,
       |    coalesce(
       |      (SELECT source_id FROM $catalogResolvedValues
       |       WHERE cat_domain = replace(lower(cand.domain), 'www.', '') ORDER BY ord LIMIT 1),
       |      (SELECT source_id FROM $catalogResolvedValues
       |       WHERE ends_with(replace(lower(cand.domain), 'www.', ''), cat_domain)
       |          OR ends_with(cat_domain, replace(lower(cand.domain), 'www.', ''))
       |       ORDER BY ord LIMIT 1),
       |      (SELECT source_id FROM $catalogResolvedValues
       |       WHERE lower(cat_type) IN ('unknown','generic','other') ORDER BY ord LIMIT 1),
       |      (SELECT source_id FROM $catalogResolvedValues
       |       WHERE lower(cat_type) = 'press' ORDER BY cat_authority ASC, ord ASC LIMIT 1)
       |    ) AS resolved_source_id,
       |    coalesce(
       |      (SELECT cat_authority FROM $catalogResolvedValues
       |       WHERE cat_domain = replace(lower(cand.domain), 'www.', '') ORDER BY ord LIMIT 1),
       |      (SELECT cat_authority FROM $catalogResolvedValues
       |       WHERE ends_with(replace(lower(cand.domain), 'www.', ''), cat_domain)
       |          OR ends_with(cat_domain, replace(lower(cand.domain), 'www.', ''))
       |       ORDER BY ord LIMIT 1),
       |      (SELECT cat_authority FROM $catalogResolvedValues
       |       WHERE lower(cat_type) IN ('unknown','generic','other') ORDER BY ord LIMIT 1),
       |      (SELECT cat_authority FROM $catalogResolvedValues
       |       WHERE lower(cat_type) = 'press' ORDER BY cat_authority ASC, ord ASC LIMIT 1),
       |      0.5) AS authority,
       |    $geoSqlExpr AS g,
       |    CASE WHEN $mismatch THEN 1.0 ELSE 0.0 END AS penalty
       |  FROM $candSrc
       |  WHERE lower(domain) NOT IN ($excl)),
       |fin AS (
       |  SELECT *,
       |    0.60 * name_match + 0.25 * g + 0.15 * authority AS base_score,
       |    least(greatest(0.60 * name_match + 0.25 * g + 0.15 * authority - penalty, 0.0), 1.0)
       |      * ${if (decay) decaySql else "1.0"} AS final_score
       |  FROM scored)
       |SELECT cand_id, poi_id, resolved_source_id,
       |  CAST(round(name_match, 6) AS DOUBLE) AS name_match,
       |  CAST(round(g, 6) AS DOUBLE) AS geo_score,
       |  CAST(round(authority, 6) AS DOUBLE) AS authority,
       |  CAST(round(penalty, 6) AS DOUBLE) AS penalty_total,
       |  CAST(round(base_score, 6) AS DOUBLE) AS base_score,
       |  CAST(round(final_score, 6) AS DOUBLE) AS final_score,
       |  CASE WHEN authority >= 1.0 AND penalty = 0.0 THEN 'ACCEPT'
       |       WHEN penalty > 0.0 THEN 'REJECT'
       |       WHEN final_score >= 0.35 THEN 'ACCEPT'
       |       WHEN final_score >= 0.20 AND (g >= 0.25 OR authority >= 0.60) THEN 'REVIEW'
       |       ELSE 'REJECT' END AS decision,
       |  CASE WHEN authority >= 1.0 AND penalty = 0.0 THEN 'confirmed_domain'
       |       WHEN penalty > 0.0 THEN ''
       |       WHEN final_score >= 0.35 THEN 'score_high'
       |       WHEN final_score >= 0.20 AND (g >= 0.25 OR authority >= 0.60) THEN 'mid_conditional'
       |       ELSE '' END AS accepted_by
       |FROM fin""".stripMargin
  }

  private def decaySql: String = {
    val asOfDate = s"CAST(TIMESTAMP '${Fixtures.asOf}' AS DATE)"
    s"""(CASE WHEN published_at IS NULL THEN 1.0
       |      WHEN date_diff('day', published_at, $asOfDate) > 365 THEN 0.0
       |      ELSE least(greatest(exp(date_diff('day', published_at, $asOfDate) / -90.0), 0.0), 1.0)
       | END)""".stripMargin
  }

  /** DuckDB replay of [[qMentionTrigramScores]]: the trigram runs over the
    * RAW poi_name vs title+snippet (trigrams lowercase internally but do not
    * normalize — scoring.py:255), poi_norm replays the full normalize chain,
    * and apex replays apexDomain's executed path (leading-www strip + last
    * two labels; the http→netloc branch is dead for bare domains). */
  private def oracleSqlTrigramScores: String = {
    import graft.expr.TextAlgo
    s"""WITH base AS (
       |  SELECT cand_id, poi_name, concat_ws(' ', title, snippet) AS txt, domain
       |  FROM ${Fixtures.serpCandidateValues}),
       |padded AS (
       |  SELECT cand_id, poi_name, txt, domain,
       |    ${TextAlgo.trigramPadSql("poi_name")} AS pa,
       |    ${TextAlgo.trigramPadSql("txt")} AS pb
       |  FROM base),
       |tri AS (
       |  SELECT cand_id, poi_name, txt, domain,
       |    ${TextAlgo.trigramSetSql("pa")} AS ta,
       |    ${TextAlgo.trigramSetSql("pb")} AS tb
       |  FROM padded),
       |apx AS (
       |  SELECT cand_id, poi_name, txt, ta, tb,
       |    CASE WHEN lower(domain) LIKE 'www.%' THEN substr(lower(domain), 5)
       |         ELSE lower(domain) END AS d2
       |  FROM tri)
       |SELECT cand_id,
       |  ${TextAlgo.normalizeSql("poi_name")} AS poi_norm,
       |  CAST(round(${TextAlgo.trigramJaccardGuardedSql("poi_name", "txt", "ta", "tb")}, 6) AS DOUBLE) AS trigram,
       |  CASE WHEN len(string_split(d2, '.')) >= 2
       |       THEN array_to_string(list_slice(string_split(d2, '.'),
       |              len(string_split(d2, '.')) - 1, len(string_split(d2, '.'))), '.')
       |       ELSE d2 END AS apex
       |FROM apx""".stripMargin
  }

  /** Full name-scores oracle: the SQL-expressible columns come from the same
    * replay as [[oracleSqlTrigramScores]]; the difflib terms (fuzzy,
    * name_score) and dedupe_key join in from [[OraclePins.serpPinValues]]
    * (CPython-difflib-computed — see OraclePins for the trust chain). Built
    * by concatenation, not stripMargin, because the inner SQL is already
    * assembled. */
  private def oracleSqlNameScores: String =
    "SELECT c.cand_id, c.poi_norm, c.trigram," +
      " CAST(round(pin.fuzzy_raw, 6) AS DOUBLE) AS fuzzy," +
      " CAST(round(pin.name_score_raw, 6) AS DOUBLE) AS name_score," +
      " pin.dedupe_key, c.apex" +
      s" FROM (\n$oracleSqlTrigramScores\n) c" +
      s" JOIN ${OraclePins.serpPinValues} ON c.cand_id = pin.cand_id"

  val oracles: Map[String, String] = Map(
    "mention_score_decision" -> oracleSqlDecision,
    "mention_score_decayed" -> oracleSqlDecisionImpl(true),
    "mention_name_scores" -> oracleSqlNameScores,
    "mention_trigram_scores" -> oracleSqlTrigramScores)
}
