package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Non-equi join shapes (SURVEY.md §2.3): theta predicates layered on equi keys
  * (J3-style containment, J7-style range). Pure theta joins (no equi component)
  * are deliberately avoided at scale — every join here carries an equi key so
  * Spark plans a shuffled/broadcast hash join, with the theta part as a
  * post-join filter, never a cartesian product.
  */
object Joins {

  /** Equi+theta join — order total exceeding the customer's account balance
    * (shape of J3's "containment on top of key match", utils/database.py:140-201). */
  def jThetaPriceVsAcctbal(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey") && o("o_totalprice") > c("c_acctbal"))
      .groupBy(col("c_nationkey"))
      // exact integer-cents sum (Relational.centsSum): order-independent
      .agg(count(lit(1)).as("n_big_orders"),
        Relational.centsSum(col("o_totalprice") - col("c_acctbal"), 2)
          .as("sum_excess"))
  }

  /** Range/band join — line quantity within ±5 of part size (J7 radius-join
    * shape, utils/database.py:224-237: equi prune + range predicate + agg). */
  def jRangeQuantitySize(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey")
        && li("l_quantity") >= p("p_size") - 5
        && li("l_quantity") <= p("p_size") + 5)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_in_band"),
        round(avg(col("l_quantity") - col("p_size")), 6).as("avg_band_offset"))
  }

  /** String-containment theta join on a broadcast dimension (J3:
    * `lower(poi.name) contains lower(q.name)`; scanner.py:217-285). The probe
    * side is tiny and broadcast; containment runs as a codegen'd filter. */
  def jContainsTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Seq("widget", "bolt", "gear").toDF("token")
    Tables.part(spark, dir)
      .join(broadcast(probes), col("p_name").contains(col("token")), "inner")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 6).as("avg_price"))
  }

  /** Probe names shared by the two J5 variants and the trigram oracle. */
  private[ops] val j5Probes = Seq("cold widgett", "larg bolt", "standart gadget")

  /** J5 — similarity join (matching.py:74-201): trigram over normalized names
    * on a broadcast probe side, best match per probe via deterministic window.
    * Uses the custom codegen'd expressions (normalize_text, trigram_similarity,
    * name_score) — not SQL-expressible, so the driver records a rows-only check;
    * exact semantics are pinned by TextAlgoSpec golden vectors, and the whole
    * join DATAFLOW is hash-pinned by [[j5TrigramTopk]] below. */
  def j5SimilarityJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.expr.{functions => F}
    import org.apache.spark.sql.expressions.Window
    // normalize ONCE per side before the join (round 1 re-normalized the part
    // name per probe and the probe per part row), and defer the expensive
    // name_score (Ratcliff-Obershelp ×3, O(|a|·|b|) per pair) until after the
    // per-probe top-1 filter — it then runs on 3 rows, not |part|×|probes|.
    // ContractSpec pins this deferred-evaluation contract in the optimized
    // plan (NameScore projections must sit above the rnk=1 filter).
    val probes = j5Probes.toDF("probe")
      .withColumn("probe_norm", F.normalize_text(col("probe")))
    val parts = Tables.fanOut(Tables.part(spark, dir), col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), F.normalize_text(col("p_name")).as("p_norm"))
    val scored = parts
      .join(broadcast(probes))
      .withColumn("tri_sim", round(F.trigram_similarity(col("p_norm"), col("probe_norm")), 6))
      .filter(col("tri_sim") >= 0.3)
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("tri_sim").desc, col("p_partkey").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .withColumn("nscore", round(F.name_score(col("probe"), col("p_name")), 6))
      .select(col("probe"), col("p_partkey"), col("p_name"), col("tri_sim"), col("nscore"))
  }

  /** J5 dataflow with a trigram-only score — the hash-pinnable variant of
    * [[j5SimilarityJoin]]. The difflib fuzzy max-term (scoring.py:219-228) is
    * the single non-SQL-expressible component of `name_score`; dropping it
    * lets the ENTIRE join dataflow — per-side normalization, broadcast probe
    * side, similarity threshold, deterministic top-1 window — replay in
    * DuckDB as padded 3-gram `list_intersect` Jaccard (matching.py:74-160
    * minus the fuzzy term), turning J5's driver check from rows-only into a
    * full hash compare. */
  def j5TrigramTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.expr.{functions => F}
    import org.apache.spark.sql.expressions.Window
    val probes = j5Probes.toDF("probe")
      .withColumn("probe_norm", F.normalize_text(col("probe")))
    val parts = Tables.fanOut(Tables.part(spark, dir), col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), F.normalize_text(col("p_name")).as("p_norm"))
    val scored = parts
      .join(broadcast(probes))
      .withColumn("tri_sim", round(F.trigram_similarity(col("p_norm"), col("probe_norm")), 6))
      .filter(col("tri_sim") >= 0.3)
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("tri_sim").desc, col("p_partkey").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe"), col("p_partkey"), col("p_name"), col("tri_sim"))
  }

  /** J5 at VOLUME — the BLOCKED similarity join (the 100 TB shape, same
    * rule as every TextDedup operator: candidates come from an equi-join
    * key, never an all-pairs cross). 100 probes derived from real part
    * names (digit-suffix near-matches), candidates = parts sharing the
    * probe's FIRST NORMALIZED TOKEN (prefix blocking — the standard
    * candidate generator for string-similarity joins), exact trigram
    * Jaccard + deterministic top-1 within the block. The un-blocked exact
    * semantics stay pinned by [[j5TrigramTopk]]; this variant declares the
    * block as part of its contract, and the oracle replays it. A probe's
    * true near-match shares its first token by construction, so blocking
    * loses nothing here while cutting the pair mass ~8× (the brute-force
    * form measured 10.8 s at sf0.1; blocked ~3 s — bounded by this
    * testdata's LOW first-token cardinality (~8 size/color words, so
    * blocks average |parts|/8). At real corpus scale the block key is the
    * higher-cardinality prefix/LSH band and the same dataflow prunes
    * proportionally harder; skewed blocks are the known hazard and the
    * per-block mass here deliberately exercises that shape. */
  def j5TrigramTopkVol(spark: SparkSession, dir: String): DataFrame = {
    import graft.expr.{functions => F}
    import org.apache.spark.sql.expressions.Window
    val blk = element_at(split(col("probe_norm"), " "), 1)
    val probes = Tables.part(spark, dir)
      .filter(col("p_partkey") % 19 === 0)
      .orderBy(col("p_partkey")).limit(100)
      .select(concat(col("p_name"), lit(" "),
        (col("p_partkey") % 7).cast("string")).as("probe"))
      .withColumn("probe_norm", F.normalize_text(col("probe")))
      .withColumn("blk", blk)
    // fanned (§2.5): the probe side is broadcast, so the normalize + per-pair
    // trigram work all runs in the parts side's partitioning — one scan task
    // without this, regardless of the block key's cardinality
    val parts = Tables.fanOut(Tables.part(spark, dir), col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), F.normalize_text(col("p_name")).as("p_norm"))
      .withColumn("blk", element_at(split(col("p_norm"), " "), 1))
    val scored = parts
      .join(broadcast(probes), Seq("blk"))
      .withColumn("tri_sim", round(F.trigram_similarity(col("p_norm"), col("probe_norm")), 6))
      .filter(col("tri_sim") >= 0.3)
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("tri_sim").desc, col("p_partkey").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("probe"), col("p_partkey"), col("p_name"), col("tri_sim"))
  }

  /** AS-OF (backward) join — each purchase event matched to the user's most
    * recent error at-or-before it (the "state as of event time" lookup of
    * event pipelines). Spark has no ASOF operator; a range join explodes
    * |left|×|window|, so this uses the UNION-MERGE form instead: tag both
    * sides, sort per user by (ts, side) — right side first on ties, giving
    * the inclusive <= convention — and carry the last right-side row forward
    * with `last(..., ignoreNulls)` over a running rows-frame. ONE shuffle on
    * the join key, one linear pass per partition, no candidate blow-up:
    * exactly the merge-join an as-of wants at 100 TB, and the partition key
    * (user_id) is high-cardinality so the exchange spreads. */
  def jAsofEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    def side(tpe: String, s: Int): DataFrame = e.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"), lit(s).as("side"))
    val u = side("error", 0).unionByName(side("purchase", 1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carried(c: Column): Column = last(when(col("side") === 0, c), ignoreNulls = true).over(w)
    u.withColumn("err_id", carried(col("event_id")))
      .withColumn("err_ts", carried(col("ts")))
      .filter(col("side") === 1 && col("err_id").isNotNull)
      .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value_r"),
        col("err_id"),
        (unix_micros(col("ts")) - unix_micros(col("err_ts"))).as("lag_us"))
  }

  /** AS-OF (nearest) join — each purchase matched to the user's NEAREST
    * error within [[AsofToleranceUs]], either direction (the
    * feature-alignment variant of [[jAsofEvents]]'s backward form: sensor
    * fusion / label alignment want the closest reading, not the latest).
    * Same union-merge shape, ONE shuffle: the backward carry reuses the
    * inclusive-<= frame; a mirrored forward frame carries the next error
    * (exclusive on ts ties, which the backward side already owns). The
    * nearer side wins, backward on distance ties; all comparisons are
    * integer microseconds. */
  val AsofToleranceUs: Long = 24L * 3600L * 1000000L
  def jAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    def side(tpe: String, s: Int): DataFrame = e.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"), lit(s).as("side"))
    val u = side("error", 0).unionByName(side("purchase", 1))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def back(c: Column): Column = last(when(col("side") === 0, c), ignoreNulls = true).over(wb)
    def fwd(c: Column): Column = first(when(col("side") === 0, c), ignoreNulls = true).over(wf)
    u.withColumn("bid", back(col("event_id"))).withColumn("bts", back(col("ts")))
      .withColumn("fid", fwd(col("event_id"))).withColumn("fts", fwd(col("ts")))
      .filter(col("side") === 1)
      .withColumn("db", unix_micros(col("ts")) - unix_micros(col("bts")))
      .withColumn("df", unix_micros(col("fts")) - unix_micros(col("ts")))
      .withColumn("use_b",
        col("bid").isNotNull && col("db") <= AsofToleranceUs &&
          (col("fid").isNull || col("df") > AsofToleranceUs || col("db") <= col("df")))
      .withColumn("use_f",
        !col("use_b") && col("fid").isNotNull && col("df") <= AsofToleranceUs)
      .filter(col("use_b") || col("use_f"))
      .select(col("event_id"), col("user_id"),
        when(col("use_b"), col("bid")).otherwise(col("fid")).as("err_id"),
        when(col("use_b"), -col("db")).otherwise(col("df")).as("delta_us"),
        when(col("use_b"), lit("backward")).otherwise(lit("forward")).as("direction"))
  }

  /** Skewed large-table equi-join resolved by AQE's skew split — the OTHER
    * half of the skew story next to the salted two-stage window
    * (MentionDedup.windowDedupSkewSafe): windows need manual salting because
    * AQE cannot split a window partition, but a skewed JOIN is exactly what
    * OptimizeSkewedJoin handles, so the right engineering is to DECLARE the
    * join and let the runtime re-plan split the hot partition.
    *
    * The planted skew mirrors the viral-domain shape (reference
    * mention_scanner/dedup.py:47-96): ~40% of lineitem rows land on one join
    * key (`l_orderkey % 10 < 4` → key 7, same arithmetic family as
    * w3_mention_dedup_skew so DuckDB replays it). The merge hint forces the
    * sort-merge path a 100 TB fact-to-fact join would take (at real scale
    * neither side broadcasts); SkewJoinSpec lowers the AQE thresholds to
    * sf-scale bytes and pins `isSkewJoin` on the executed join plus result
    * parity with the unhinted plan. In production the same query needs no
    * tuning: default thresholds fire on real partition sizes. */
  /** The join kernel, parameterized by its fact input so SkewJoinSpec can
    * feed a many-mapper shape (AQE splits a skewed reduce partition by
    * mapper ranges — a single-row-group local file gives one data-bearing
    * mapper, which is structurally unsplittable; a cluster scan has
    * thousands). Hot key 7 carries ~40% of rows; the cold 60% spreads over
    * ~600 residues so the hot SHUFFLE PARTITION dominates the median by the
    * multiple the skew detector keys on (a handful of cold keys would
    * flatten the per-partition distribution and hide the straggler). */
  def skewJoinAgg(l: DataFrame, n: DataFrame): DataFrame = {
    val skewed = l.withColumn("skewkey",
      when(pmod(col("l_orderkey"), lit(10)) < 4, lit(7))
        .otherwise(pmod(col("l_orderkey"), lit(1000))))
    skewed.join(n.hint("merge"), col("skewkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 4).as("sum_qty"))
  }

  def jSkewAqeJoin(spark: SparkSession, dir: String): DataFrame =
    skewJoinAgg(Tables.lineitem(spark, dir), Tables.nation(spark, dir))

  val queries: Map[String, Relational.Q] = Map(
    "j_skew_aqe_join" -> (jSkewAqeJoin _),
    "j_theta_price_vs_acctbal" -> (jThetaPriceVsAcctbal _),
    "j_range_quantity_size" -> (jRangeQuantitySize _),
    "j_contains_tokens" -> (jContainsTokens _),
    "j_asof_events" -> (jAsofEvents _),
    "j_asof_nearest" -> (jAsofNearest _),
    "j5_similarity_join" -> (j5SimilarityJoin _),
    "j5_trigram_topk" -> (j5TrigramTopk _),
    "j5_trigram_topk_vol" -> (j5TrigramTopkVol _))

  val oracles: Map[String, String] = Map(
    "j_skew_aqe_join" ->
      """SELECT n_name, count(*) AS n_rows, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN nation
        |  ON (CASE WHEN l_orderkey % 10 < 4 THEN 7 ELSE l_orderkey % 1000 END) = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "j_theta_price_vs_acctbal" ->
      s"""SELECT c_nationkey, count(*) AS n_big_orders,
        |  ${Relational.centsSumSql("o_totalprice - c_acctbal", 2)} AS sum_excess
        |FROM orders JOIN customer
        |  ON o_custkey = c_custkey AND o_totalprice > c_acctbal
        |GROUP BY c_nationkey""".stripMargin,
    "j_range_quantity_size" ->
      """SELECT p_brand, count(*) AS n_in_band,
        |  round(avg(l_quantity - p_size), 6) AS avg_band_offset
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
        |GROUP BY p_brand""".stripMargin,
    "j_contains_tokens" ->
      """SELECT token, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
        |FROM part JOIN (VALUES ('widget'), ('bolt'), ('gear')) AS t(token)
        |  ON contains(p_name, token)
        |GROUP BY token""".stripMargin,
    // same union-merge form (DuckDB's native ASOF JOIN would also work; the
    // union spelling keeps the tie convention explicit and engine-portable)
    "j_asof_events" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value, 0 AS side FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, value, 1 AS side FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, event_id, value, side,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER w AS err_id,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER w AS err_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, side ASC, event_id ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, round(value, 2) AS value_r, err_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(err_ts AS TIMESTAMP)) AS lag_us
        |FROM c WHERE side = 1 AND err_id IS NOT NULL""".stripMargin,
    "j_asof_nearest" -> {
      val tol = 24L * 3600L * 1000000L
      s"""WITH u AS (
         |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'error'
         |  UNION ALL
         |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, ts, event_id, side,
         |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER wb AS bid,
         |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER wb AS bts,
         |    first_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER wf AS fid,
         |    first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER wf AS fts
         |  FROM u
         |  WINDOW
         |    wb AS (PARTITION BY user_id ORDER BY ts ASC, side ASC, event_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY user_id ORDER BY ts ASC, side ASC, event_id ASC
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |d AS (
         |  SELECT event_id, user_id, bid, fid,
         |    epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(bts AS TIMESTAMP)) AS db,
         |    epoch_us(CAST(fts AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)) AS df
         |  FROM c WHERE side = 1),
         |p AS (
         |  SELECT *,
         |    (bid IS NOT NULL AND db <= $tol
         |      AND (fid IS NULL OR df > $tol OR db <= df)) AS use_b
         |  FROM d)
         |SELECT event_id, user_id,
         |  CASE WHEN use_b THEN bid ELSE fid END AS err_id,
         |  CASE WHEN use_b THEN -db ELSE df END AS delta_us,
         |  CASE WHEN use_b THEN 'backward' ELSE 'forward' END AS direction
         |FROM p
         |WHERE use_b OR (fid IS NOT NULL AND df <= $tol)""".stripMargin
    },
    "j5_trigram_topk" -> j5TrigramOracle,
    "j5_similarity_join" -> j5SimilarityOracle,
    "j5_trigram_topk_vol" -> j5TrigramOracleFrom(
      s"""probes AS (
         |  SELECT probe, ${graft.expr.TextAlgo.normalizeSql("probe")} AS probe_norm
         |  FROM (SELECT p_name || ' ' || CAST(p_partkey % 7 AS VARCHAR) AS probe
         |        FROM part WHERE p_partkey % 19 = 0
         |        ORDER BY p_partkey LIMIT 100) pr)""".stripMargin,
      // prefix blocking: candidates share the first normalized token
      candJoin = "JOIN probes ON string_split(p_norm, ' ')[1] = string_split(probe_norm, ' ')[1]"))

  /** Full [[j5SimilarityJoin]] oracle: winner selection replays entirely in
    * DuckDB (same CTE chain as [[j5TrigramOracle]]); only the difflib
    * `nscore` joins in from [[graft.domain.OraclePins.j5PinValues]]
    * (CPython-difflib-computed, keyed by the `part` row count so one pin set
    * serves every testdata sf — see OraclePins for the trust chain). Built by
    * concatenation, not stripMargin, around the already-assembled inner SQL. */
  private def j5SimilarityOracle: String =
    "SELECT t.probe, t.p_partkey, t.p_name, t.tri_sim," +
      " CAST(round(pin.nscore_raw, 6) AS DOUBLE) AS nscore" +
      s" FROM (\n$j5TrigramOracle\n) t" +
      s" JOIN ${graft.domain.OraclePins.j5PinValues}" +
      " ON pin.probe = t.probe AND pin.p_partkey = t.p_partkey" +
      " WHERE pin.part_rows = (SELECT count(*) FROM part)"

  /** DuckDB replay of [[j5TrigramTopk]]: probe normalization is precomputed
    * Scala-side (same [[graft.expr.TextAlgo.normalize]] the Catalyst
    * expression calls), the part side replays the full normalize chain in
    * SQL, and the trigram Jaccard + top-1 window mirror the Spark plan. */
  private def j5TrigramOracle: String = {
    import graft.expr.TextAlgo
    val probeVals = j5Probes.map { p =>
      s"('${p.replace("'", "''")}', '${TextAlgo.normalize(p).replace("'", "''")}')"
    }.mkString(", ")
    j5TrigramOracleFrom(s"probes(probe, probe_norm) AS (VALUES $probeVals)")
  }

  /** The J5 trigram replay over a parameterized probes CTE (must yield
    * probe, probe_norm) and candidate join (CROSS for the exact fixture
    * variant, block-equi for the volume variant) — one proven text. */
  private def j5TrigramOracleFrom(probesCte: String,
      candJoin: String = "CROSS JOIN probes"): String = {
    import graft.expr.TextAlgo
    s"""WITH $probesCte,
       |parts AS (
       |  SELECT p_partkey, p_name, ${TextAlgo.normalizeSql("p_name")} AS p_norm FROM part),
       |padded AS (
       |  SELECT p_partkey, p_name, probe, p_norm, probe_norm,
       |    ${TextAlgo.trigramPadSql("p_norm")} AS pa,
       |    ${TextAlgo.trigramPadSql("probe_norm")} AS pb
       |  FROM parts $candJoin),
       |tri AS (
       |  SELECT p_partkey, p_name, probe, p_norm, probe_norm,
       |    ${TextAlgo.trigramSetSql("pa")} AS ta,
       |    ${TextAlgo.trigramSetSql("pb")} AS tb
       |  FROM padded),
       |sim AS (
       |  SELECT p_partkey, p_name, probe,
       |    CAST(round(${TextAlgo.trigramJaccardGuardedSql("p_norm", "probe_norm", "ta", "tb")}, 6) AS DOUBLE) AS tri_sim
       |  FROM tri),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe ORDER BY tri_sim DESC, p_partkey ASC) AS rnk
       |  FROM sim WHERE tri_sim >= 0.3)
       |SELECT probe, p_partkey, p_name, tri_sim FROM ranked WHERE rnk = 1""".stripMargin
  }
}
