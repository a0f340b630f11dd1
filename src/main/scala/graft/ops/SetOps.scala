package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations, distinct, array set-functions, rollup (SURVEY.md §2.6 + the
  * grouping-set freebies Catalyst provides beyond the reference).
  */
object SetOps {

  /** D1/D2 — UNION (distinct) of two relations (scanner.py:335 catalog ∪ CSE). */
  def dUnionNations(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").cast("int").as("nationkey"))
    c.union(s).distinct()
  }

  /** INTERSECT — nations having both customers and suppliers. */
  def dIntersectNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").cast("int").as("nationkey")))

  /** EXCEPT — nations with FURNITURE customers but no high-balance supplier
    * (filtered so the result is non-empty on the testdata). */
  def dExceptNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "FURNITURE")
      .select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(spark, dir)
        .filter(col("s_acctbal") > 7000.0)
        .select(col("s_nationkey").cast("int").as("nationkey")))

  /** INTERSECT ALL — multiset semantics: each nation key appears
    * min(#customers, #suppliers) times, the surviving-duplicates contract
    * `intersect()` cannot express (SURVEY §2.6's declared ALL variants).
    * Catalyst plans both ALL set-ops as a single aggregate+generate over a
    * union — one shuffle, no join. */
  def dIntersectAllNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersectAll(Tables.supplier(spark, dir)
        .select(col("s_nationkey").cast("int").as("nationkey")))

  /** EXCEPT ALL — bag difference: #customers minus #high-balance-suppliers
    * occurrences per nation key survive. */
  def dExceptAllNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "FURNITURE")
      .select(col("c_nationkey").as("nationkey"))
      .exceptAll(Tables.supplier(spark, dir)
        .filter(col("s_acctbal") > 7000.0)
        .select(col("s_nationkey").cast("int").as("nationkey")))

  /** GROUPING SETS in the general form — a set list NOT derivable from
    * rollup or cube: per-segment totals, per-priority totals, and the grand
    * total, WITHOUT the (segment, priority) cross cells (rollup of the pair
    * would include them; cube would add them too). One Expand + one
    * aggregate: the fact join is scanned once for all three sets. Revenue
    * uses the q3 decimal-sum contract so the total is partition-order
    * independent. */
  def dGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val gid = (when(col("c_mktsegment").isNull, 2).otherwise(0) +
      when(col("o_orderpriority").isNull, 1).otherwise(0)).cast("long")
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      // quantize BEFORE the Expand: grouping sets replicate every input row
      // once per set, so a quantization inside the aggregate would run
      // |sets|× per row; projected here it runs once (Relational.quantize)
      .withColumn("price_cents", Relational.quantize(col("o_totalprice"), 2))
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("o_orderpriority")), Seq()),
        col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.centsTotal(col("price_cents"), 2).as("sum_price"))
      .select(gid.as("gid"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
  }

  /** D4/D5 — array distinct + overlap test over tokenized names
    * (google_places_ingester.py:98-104 order-preserving distinct;
    * matching.py:157-159 token overlap). */
  def dArrayOps(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        size(array_distinct(words)).cast("long").as("n_distinct_tokens"),
        arrays_overlap(words, array(lit("widget"), lit("gear"))).as("is_widget_or_gear"),
        size(array_intersect(words, array(lit("cold"), lit("small"), lit("large"))))
          .cast("long").as("n_size_words"))
  }

  /** ROLLUP with grouping flags — hierarchy totals (not in the reference;
    * declared Catalyst capability per SURVEY §2.6). */
  def dRollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      // quantize before the rollup Expand (see dCubeSegmentPriority)
      .withColumn("bal_cents", Relational.quantize(col("c_acctbal"), 2))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        Relational.centsTotal(col("bal_cents"), 2).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("sum_acctbal"))
  }

  /** CUBE with an explicit grouping id — all four (segment, priority)
    * grouping sets in one pass (Catalyst expands the cube into a single
    * Expand + aggregate, so the fact table is scanned once, not 4×). The
    * grouping id is derived from the null pattern of the NOT-NULL dims
    * rather than grouping_id(), so the same expression replays verbatim
    * in the oracle dialect. */
  def dCubeSegmentPriority(spark: SparkSession, dir: String): DataFrame = {
    val gid = (when(col("c_mktsegment").isNull, 2).otherwise(0) +
      when(col("o_orderpriority").isNull, 1).otherwise(0)).cast("long")
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      // quantize BEFORE the Expand: cube replicates every input row 4× (one
      // per grouping set), so a quantization inside the aggregate would run
      // 4× per row; projected here it runs once (Relational.quantize)
      .withColumn("price_cents", Relational.quantize(col("o_totalprice"), 2))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.centsTotal(col("price_cents"), 2).as("sum_price"))
      .select(gid.as("gid"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
  }

  /** PIVOT — wide-format cross-tab via the DataFrame pivot API (explicit
    * value list, so Catalyst skips the extra distinct-values job and the
    * output schema is static — the 100 TB-safe way to call pivot). Nulls
    * from absent cells coalesce to 0 to match the oracle's conditional
    * counts. */
  def dPivotSegmentPriority(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val aliases = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .select(col("c_mktsegment") +:
        prios.zip(aliases).map { case (p, a) =>
          coalesce(col(s"`$p`"), lit(0L)).as(a) }: _*)
  }

  /** UNPIVOT — the inverse surface: melt the pivoted wide table back to
    * (segment, priority, n) long form via the Dataset unpivot API. Declared
    * oracle is the plain GROUP BY counts, so the driver's hash gate proves
    * pivot∘unpivot ≡ identity on real data. */
  def dUnpivotSegmentPriority(spark: SparkSession, dir: String): DataFrame = {
    val aliases = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
    dPivotSegmentPriority(spark, dir).unpivot(
      ids = Array(col("c_mktsegment")),
      values = aliases.map(col).toArray,
      variableColumnName = "priority_slot",
      valueColumnName = "n_orders")
  }

  val queries: Map[String, Relational.Q] = Map(
    "d_pivot_segment_priority" -> (dPivotSegmentPriority _),
    "d_unpivot_segment_priority" -> (dUnpivotSegmentPriority _),
    "d_cube_segment_priority" -> (dCubeSegmentPriority _),
    "d_union_nations" -> (dUnionNations _),
    "d_intersect_nations" -> (dIntersectNations _),
    "d_except_nations" -> (dExceptNations _),
    "d_intersect_all_nations" -> (dIntersectAllNations _),
    "d_except_all_nations" -> (dExceptAllNations _),
    "d_grouping_sets" -> (dGroupingSets _),
    "d_array_ops" -> (dArrayOps _),
    "d_rollup_region_nation" -> (dRollupRegionNation _))

  val oracles: Map[String, String] = Map(
    "d_union_nations" ->
      "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey AS nationkey FROM supplier",
    "d_intersect_nations" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier",
    "d_except_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'FURNITURE'
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000.0""".stripMargin,
    "d_intersect_all_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "d_except_all_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'FURNITURE'
        |EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000.0""".stripMargin,
    "d_grouping_sets" ->
      s"""SELECT
        |  CAST(2 * (CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS gid,
        |  coalesce(c_mktsegment, 'ALL') AS segment,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  ${Relational.centsSumSql("o_totalprice", 2)} AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())""".stripMargin,
    "d_array_ops" ->
      """SELECT p_partkey,
        |  len(list_distinct(string_split(p_name, ' '))) AS n_distinct_tokens,
        |  list_has_any(string_split(p_name, ' '), ['widget', 'gear']) AS is_widget_or_gear,
        |  len(list_intersect(string_split(p_name, ' '), ['cold', 'small', 'large'])) AS n_size_words
        |FROM part""".stripMargin,
    "d_rollup_region_nation" ->
      s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_customers,
        |  ${Relational.centsSumSql("c_acctbal", 2)} AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "d_cube_segment_priority" ->
      s"""SELECT
        |  CAST((CASE WHEN c_mktsegment IS NULL THEN 2 ELSE 0 END) +
        |       (CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS gid,
        |  coalesce(c_mktsegment, 'ALL') AS segment,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  ${Relational.centsSumSql("o_totalprice", 2)} AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin,
    "d_pivot_segment_priority" ->
      """SELECT c_mktsegment,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
        |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    // Spark's melt emits a 0-count row for EVERY (segment, slot) cell (the
    // pivot coalesces absent cells to 0), so the oracle must generate the
    // full segment × slot grid and left-join the observed counts — a bare
    // GROUP BY drops empty cells and breaks rows_match at small/filtered
    // SFs even though both results are correct.
    "d_unpivot_segment_priority" ->
      """WITH slots(priority_slot, o_orderpriority) AS (VALUES
        |  ('p1_urgent', '1-URGENT'), ('p2_high', '2-HIGH'),
        |  ('p3_medium', '3-MEDIUM'), ('p4_not_specified', '4-NOT SPECIFIED'),
        |  ('p5_low', '5-LOW')),
        |obs AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |segs AS (SELECT DISTINCT c_mktsegment FROM obs)
        |SELECT s.c_mktsegment, sl.priority_slot,
        |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
        |FROM segs s CROSS JOIN slots sl
        |LEFT JOIN obs o ON o.c_mktsegment = s.c_mktsegment
        |  AND o.o_orderpriority = sl.o_orderpriority""".stripMargin)
}
