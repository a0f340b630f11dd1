package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Window-function operators (SURVEY.md §2.5 W1–W10).
  *
  * W1 (latest-per-key) lives in [[Relational]]; here: trailing range windows
  * (W2 momentum), top-N per group (W3/W5/W7), deterministic multi-key top-k
  * (W6/W10), and per-group rank gating (W9).
  *
  * Scale: window shuffles partition by their key (user_id / custkey) — at
  * 100 TB these are high-cardinality keys, so the exchange is well spread; no
  * global sort is ever requested except under an explicit LIMIT (top-k), which
  * Spark executes as per-partition top-k + single reduce.
  */
object Windows {

  /** W2 — trailing 14-day first/last delta (intelligent_classifier.py:184-209).
    * Day-indexed RANGE frame so the oracle's integer RANGE matches exactly. */
  def w2TrailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val dayIdx = datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
      .rangeBetween(-14, 0)
    Tables.events(spark, dir)
      .withColumn("day_idx", dayIdx.cast("long"))
      .withColumn("trailing_sum", round(sum(col("value")).over(w), 4))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("day_idx"),
        col("trailing_sum"), col("trailing_n"))
  }

  /** W3/W5 — top-N per group with deterministic tie-break (dedup.py:47-96 keeps
    * ≤N best-scored rows per key; collection_generator.py:309-311 top-8). */
  def w3TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"), col("rnk").cast("long").as("rnk"))
  }

  /** W6/W10 — global multi-key ordered top-k (scoring.py:182-206 tie-break:
    * score desc rounded, then key asc; logging_ext.py top-10 domains). */
  def w6TopEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value_r"))
      .orderBy(col("value_r").desc, col("user_id").asc, col("event_id").asc)
      .limit(20)

  /** W9 + A-style gate — per-group rank cap plus HAVING count≥2
    * (scanner.py:841-842 limit-per-poi; collection min size). */
  def w9RankGate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val ranked = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    ranked.groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("top5_purchase_sum"),
        count(lit(1)).as("n_kept"))
      .filter(col("n_kept") >= 2)
  }

  /** W11 — the distribution-rank window family (ntile / percent_rank /
    * cume_dist) in one pass over one window sort. The order is made TOTAL
    * (price, then key) so ntile's row-position semantics are deterministic;
    * percent_rank and cume_dist are exact rationals of row counts, so the
    * doubles agree cross-engine bit for bit. */
  def w11DistributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** W12 — windowed funnel (the ClickHouse-windowFunnel class of analytics):
    * per user, greedy earliest-first matching of view → click → signup →
    * purchase where every later step is strictly after the previous match
    * and inside [[FunnelHours]] of the first view. Each step is one
    * filter + min-aggregate + equi-join, ALL keyed on user_id — one
    * partitioning carried through the whole chain, no window over the raw
    * event log, no per-user sort. Timestamp arithmetic is exact
    * microsecond TIMESTAMP+INTERVAL in both engines, so the greedy match
    * replays bit for bit. */
  val FunnelHours = 48
  def w12Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def step(t: String) = ev.filter(col("event_type") === t)
    val lim = expr(s"t1 + INTERVAL $FunnelHours HOURS")
    val s1 = step("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = step("click").join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") <= lim)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = step("signup").join(s2, Seq("user_id")).join(s1, Seq("user_id"))
      .filter(col("ts") > col("t2") && col("ts") <= lim)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val s4 = step("purchase").join(s3, Seq("user_id")).join(s1, Seq("user_id"))
      .filter(col("ts") > col("t3") && col("ts") <= lim)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t4"))
    def fmt(c: String) = date_format(col(c), "yyyy-MM-dd HH:mm:ss")
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .join(s4, Seq("user_id"), "left")
      .select(col("user_id"),
        fmt("t1").as("t_view"), fmt("t2").as("t_click"),
        fmt("t3").as("t_signup"), fmt("t4").as("t_purchase"),
        when(col("t4").isNotNull, 4L).when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L).otherwise(1L).as("depth"))
  }

  /** W13 — cohort retention matrix: customers cohorted by the month of
    * their FIRST order (80 months of history → a real triangular matrix);
    * each (cohort_month, month_offset) cell counts the distinct customers
    * ordering again that month, beside the cohort size and the retention
    * ratio. Two shuffles total (first-order per customer; cell
    * aggregate); month indexing is exact integer arithmetic on
    * year()/month(), and the ratio is one double division of two exact
    * integers. */
  def w13RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mo"))
    val first = ev.groupBy(col("o_custkey")).agg(min(col("mo")).as("cohort_month"))
    val sizes = first.groupBy(col("cohort_month")).agg(count(lit(1)).as("cohort_size"))
    ev.join(first, Seq("o_custkey"))
      .groupBy(col("cohort_month"), (col("mo") - col("cohort_month")).as("month_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_month"))
      .select(col("cohort_month"), col("month_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") * lit(1.0) / col("cohort_size"), 6).as("retention"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "w13_retention_cohorts" -> (w13RetentionCohorts _),
    "w12_funnel" -> (w12Funnel _),
    "w11_distribution_ranks" -> (w11DistributionRanks _),
    "w2_trailing_window" -> (w2TrailingWindow _),
    "w3_top_orders_per_customer" -> (w3TopOrdersPerCustomer _),
    "w6_top_events" -> (w6TopEvents _),
    "w9_rank_gate" -> (w9RankGate _))

  val oracles: Map[String, String] = Map(
    "w13_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT o_custkey,
        |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mo
        |  FROM orders),
        |first_mo AS (SELECT o_custkey, min(mo) AS cohort_month FROM ev GROUP BY o_custkey),
        |sizes AS (SELECT cohort_month, count(*) AS cohort_size FROM first_mo GROUP BY cohort_month),
        |act AS (
        |  SELECT cohort_month, mo - cohort_month AS month_offset,
        |    count(DISTINCT o_custkey) AS n_active
        |  FROM ev JOIN first_mo USING (o_custkey) GROUP BY 1, 2)
        |SELECT cohort_month, month_offset, n_active, cohort_size,
        |  round(n_active * 1.0 / cohort_size, 6) AS retention
        |FROM act JOIN sizes USING (cohort_month)""".stripMargin,
    "w12_funnel" ->
      s"""WITH s1 AS MATERIALIZED (
         |  SELECT user_id, min(ts) AS t1 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS MATERIALIZED (
         |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
         |  WHERE event_type = 'click' AND ts > t1
         |    AND ts <= t1 + INTERVAL $FunnelHours HOUR GROUP BY e.user_id),
         |s3 AS MATERIALIZED (
         |  SELECT e.user_id, min(ts) AS t3
         |  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
         |  WHERE event_type = 'signup' AND ts > t2
         |    AND ts <= t1 + INTERVAL $FunnelHours HOUR GROUP BY e.user_id),
         |s4 AS MATERIALIZED (
         |  SELECT e.user_id, min(ts) AS t4
         |  FROM events e JOIN s3 USING (user_id) JOIN s1 USING (user_id)
         |  WHERE event_type = 'purchase' AND ts > t3
         |    AND ts <= t1 + INTERVAL $FunnelHours HOUR GROUP BY e.user_id)
         |SELECT user_id,
         |  strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_view,
         |  strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_click,
         |  strftime(t3, '%Y-%m-%d %H:%M:%S') AS t_signup,
         |  strftime(t4, '%Y-%m-%d %H:%M:%S') AS t_purchase,
         |  CAST(CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
         |       WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS depth
         |FROM s1
         |LEFT JOIN s2 USING (user_id)
         |LEFT JOIN s3 USING (user_id)
         |LEFT JOIN s4 USING (user_id)""".stripMargin,
    "w11_distribution_ranks" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "w2_trailing_window" ->
      """SELECT event_id, user_id, day_idx,
        |  round(sum(value) OVER w, 4) AS trailing_sum,
        |  count(*) OVER w AS trailing_n
        |FROM (SELECT event_id, user_id, value,
        |        date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
        |             RANGE BETWEEN 14 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w3_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice, rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER
        |        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |      FROM orders) WHERE rnk <= 3""".stripMargin,
    "w6_top_events" ->
      """SELECT event_id, user_id, round(value, 2) AS value_r
        |FROM events
        |ORDER BY value_r DESC, user_id ASC, event_id ASC LIMIT 20""".stripMargin,
    "w9_rank_gate" ->
      """SELECT user_id, round(sum(value), 4) AS top5_purchase_sum, count(*) AS n_kept
        |FROM (SELECT user_id, value, row_number() OVER
        |        (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
        |      FROM events WHERE event_type = 'purchase') WHERE rnk <= 5
        |GROUP BY user_id HAVING count(*) >= 2""".stripMargin)
}
