package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational-completeness queries over the driver testdata (SURVEY.md §2.2–§2.7).
  *
  * Each query here maps one operator family of the reference onto the TPC-H-ish
  * tables so the driver's DuckDB oracle can hash-check it at sf0.01. Domain
  * dataflows (classifier, mention scoring, …) live in their own modules.
  *
  * Scale notes (100 TB north star): every query keeps filters/projections at the
  * scan (pushdown), joins dimension tables via broadcast, and aggregates with
  * map-side partial aggregation. No collect(), no driver-side loops.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** EXACT MONEY SUM, fast path: the input expression is a fixed-point value
    * with `scale` decimal digits (TPC-H money columns carry 2; a product of
    * two money terms carries ≤ 4), so quantizing each term to integer units
    * ([[quantize]] — nearest integer absorbs the representation error of
    * the double product) and summing LONGS is exact and partition-order
    * independent, with none of the >18-precision BigDecimal cost that a
    * DECIMAL(28,6) sum pays per row (~4x on the q1 flagship, measured).
    * Capacity: aggregate magnitude must stay < 2^63 / 10^scale — 9e16 money
    * units at scale 2 — far past any driver SF; a true 100 TB deployment of
    * a SINGLE global total would move this one aggregate to DECIMAL.
    * [[centsSumSql]] is the oracle-dialect mirror (DuckDB sums BIGINT into
    * HUGEINT, hence the explicit cast back). */
  /** Per-row quantization to integer units, allocation-free: Spark's `round`
    * on DoubleType codegens to `BigDecimal.valueOf(x).setScale(...)` — two
    * heap allocations PER ROW per money term, the dominant cost the r14
    * integer-cents conversion added to the q1 flagship. The contract here is
    * that `x` is fixed-point with `scale` digits, so `x * 10^scale` is an
    * integer ± double representation error and NEVER a true half — nearest
    * integer via `floor(v + 0.5)` is therefore value-identical to HALF_UP
    * rounding for both signs (for x = n − ε: floor(n − ε + 0.5) = n), while
    * staying pure double math inside whole-stage codegen. Returns LongType
    * (Spark's `floor(double)` is LongType; null propagates). */
  def quantize(x: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    val unit = math.pow(10, scale) // exact for small scales
    floor(x * unit + lit(0.5))
  }

  /** Finisher over an already-quantized (or summed) cents column: exact long
    * sum, one double division + round per GROUP. Pre-project [[quantize]]d
    * columns before a groupBy carrying several money aggregates so each row
    * pays one quantization per term, not per (term × aggregate). */
  def centsTotal(cents: org.apache.spark.sql.Column, scale: Int,
      outScale: Int = 4): org.apache.spark.sql.Column = {
    val unit = math.pow(10, scale)
    round(sum(cents) / unit, outScale)
  }

  def centsSum(x: org.apache.spark.sql.Column, scale: Int, outScale: Int = 4): org.apache.spark.sql.Column =
    centsTotal(quantize(x, scale), scale, outScale)
  def centsSumSql(x: String, scale: Int, outScale: Int = 4): String = {
    val unit = BigInt(10).pow(scale)
    // divisor cast: a bare `100.0` literal parses as DECIMAL in both SQL
    // dialects, silently turning the result column into DECIMAL on the
    // Spark side — the CAST pins double division in both engines
    s"round(CAST(sum(CAST(round(($x) * $unit, 0) AS BIGINT)) AS BIGINT)" +
      s" / CAST($unit AS DOUBLE), $outScale)"
  }

  /** Reference A-family groupBy aggregations (SURVEY §2.4; intelligent_classifier.py
    * city stats / db.py counts): wide agg with sum/avg/count + arithmetic. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("date"))
      // price sums use the exact integer-cents contract: quantize each money
      // term ONCE in a projection fused into the scan stage ([[quantize]] —
      // allocation-free nearest-integer, not Spark's BigDecimal `round`),
      // then sum longs — exact, order-independent, double-sum speed. The raw
      // double sum's order-spread (~3e-5 at sf0.1) is within 2x of the
      // 4-decimal rounding margin, so exactness is required. Quantity sums
      // and the small-magnitude averages are exact in double as-is.
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_discount"),
        quantize(col("l_extendedprice"), 2).as("bp_cents"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("dp_cents"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        centsTotal(col("bp_cents"), 2).as("sum_base_price"),
        centsTotal(col("dp_cents"), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Multi-way equi join with broadcast dimensions (SURVEY §2.3 J2/J4 shape):
    * revenue per region; nation/region are broadcast (dims ≪ fact). */
  def q3RevenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = broadcast(Tables.nation(spark, dir))
    val r  = broadcast(Tables.region(spark, dir))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        // exact integer-cents revenue ([[centsSum]]): order-independent —
        // a raw double sum lands on a different 4th decimal than DuckDB's
        // at sf0.1 row counts — at long-sum speed (the earlier DECIMAL
        // form cost ~4x)
        centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** LEFT SEMI join — existence checks (`_exists_in_db`, h3_scheduler.py:672-678). */
  def jSemiCustomersWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** LEFT ANTI join — absent-in-db novelty flag (h3_scheduler.py:654-660).
    * Filtered to finished orders so the result is non-empty on the testdata. */
  def jAntiCustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === lit("F")).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** W1 latest-snapshot-per-key (db.py:131-145): row_number over desc event time.
    * Tie-broken by event_id so the pick is deterministic for the oracle. */
  def w1LatestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"),
        col("event_type").as("latest_event_type"),
        round(col("value"), 4).as("latest_value"))
  }

  /** A7 exact percentiles per group (intelligent_classifier.py:488-541 —
    * reference computes p50/p95 by manual sort-index; we use exact interpolated
    * percentile, which DuckDB's quantile_cont reproduces). */
  def a7Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_value"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_value"),
        count(lit(1)).as("n"))

  /** A1 authority decay sum (intelligent_classifier.py:51-99): per-key
    * Σ value·exp(-Δdays/τ), soft-capped tanh(raw/100)·100, clamped [0,100].
    * Day-level date math keeps ns-vs-µs timestamp precision out of the oracle. */
  def a1DecaySum(spark: SparkSession, dir: String): DataFrame = {
    val asOf = lit("2025-01-01").cast("date")
    val days = datediff(asOf, to_date(col("ts")))
    val weighted = col("value") * exp(days.cast("double") / lit(-90.0))
    // tanh spelled as (e^2x-1)/(e^2x+1) on both sides: the oracle's DuckDB
    // (1.0.0) ships no tanh/log1p builtins, and an identical formula keeps
    // float behavior aligned beyond the 6dp rounding.
    def tanhE(x: org.apache.spark.sql.Column) =
      (exp(x * 2.0) - 1.0) / (exp(x * 2.0) + 1.0)
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(weighted).as("raw"))
      .select(
        col("user_id"),
        round(least(greatest(tanhE(col("raw") / lit(100.0)) * lit(100.0), lit(0.0)), lit(100.0)), 6)
          .as("authority_score"))
  }

  /** Same aggregation through the SQL surface (temp views + spark.sql +
    * registered custom expressions), demonstrating the `spark.sql(...)` API
    * path of SURVEY §1 intro; the oracle is shared with q1. */
  def q1Sql(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.functions.registerAll(spark)
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    // the integer-cents sum is dialect-neutral SQL: this exact text is also
    // the DuckDB oracle ([[q1OracleSql]]), so the two engines' expressions
    // cannot drift
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 4) AS sum_qty,
         |  ${centsSumSql("l_extendedprice", 2)} AS sum_base_price,
         |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
         |  round(avg(l_quantity), 6) AS avg_qty,
         |  round(avg(l_discount), 6) AS avg_disc,
         |  count(1) AS count_order
         |FROM lineitem_v WHERE l_shipdate <= DATE '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Correlated-subquery shape (Catalyst freebie per SURVEY §2.3 note):
    * customers above their nation's average balance — expressed as a window
    * average (the scalable decorrelated form); the oracle uses the literal
    * correlated subquery, proving the two formulations agree. */
  def qCorrelatedAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    Tables.customer(spark, dir)
      .withColumn("nation_avg", avg(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 4).as("c_acctbal"),
        round(col("nation_avg"), 6).as("nation_avg"))
  }

  /** TPC-H Q5 shape — the six-way local-supplier-volume join: the
    * lineitem⋈orders⋈customer⋈supplier chain with the EXTRA
    * c_nationkey = s_nationkey equi-condition, region-filtered through
    * broadcast dims with the filter PUSHED to the dim side so join
    * reorder prunes early. Revenue uses the q3 decimal-sum contract
    * (round-6 per item, DECIMAL sum) so the total is partition-order
    * independent. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = broadcast(Tables.nation(spark, dir))
    val r  = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(n, s("s_nationkey").cast("int") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 shape — large-volume customers: per-order quantity
    * aggregate, HAVING gate, then join BACK to the order/customer grain.
    * l_quantity values are integral, so the double sum is exact and
    * order-independent without the decimal detour. */
  def q18LargeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 4).as("o_totalprice"), col("total_qty"))
  }

  /** The Q7 nation pair (synthetic nation names in the test tables). */
  val Q7NationA = "NATION_1"; val Q7NationB = "NATION_2"

  /** TPC-H Q7 shape — volume shipping between two nations: the canonical
    * 6-relation join (lineitem–orders–customer–supplier–nation×2) with a
    * DISJUNCTIVE cross-dim predicate (either shipping direction). Plan
    * discipline: the ship-date range is the only filter on the fact and
    * is pushed to the scan; each nation dim pre-filters to the 2-row pair
    * set and broadcasts, so suppliers/customers outside the pair fall out
    * at their (broadcast) joins before the big equi-joins; the
    * direction disjunction runs as a residual on the 2×2 remnant. Revenue
    * uses the exact integer-cents contract ([[centsSum]], scale 4 for the
    * 2dp×2dp product). */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq(Q7NationA, Q7NationB)
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val n1 = broadcast(Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey").cast("int") === col("sn_key"))
      .join(n2, col("c_nationkey").cast("int") === col("cn_key"))
      .filter((col("supp_nation") === Q7NationA && col("cust_nation") === Q7NationB) ||
        (col("supp_nation") === Q7NationB && col("cust_nation") === Q7NationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(centsSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q13 shape — order-count distribution: how many customers placed
    * exactly N (non-urgent) orders, INCLUDING the zero bucket. The classic
    * outer-join-then-double-aggregate. Scale discipline: orders collapse to
    * per-customer counts FIRST (map-side combinable, the join then carries
    * |customers| + |active customers| rows instead of |orders|), the outer
    * join supplies the zeros, and the second aggregate runs over the tiny
    * distinct-count domain. */
  def q13OrderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 shape — small-quantity-order revenue: the correlated
    * per-part average (`l_quantity < 0.2 * avg(l_quantity) for this part`)
    * in its DECORRELATED form: one brand-pruned scan feeds both the per-part
    * limits and the probe side, joined back on the part key. The brand dim
    * filter broadcasts, so the fact scan is pruned before any shuffle; the
    * self-join is equi on l_partkey. Revenue uses integer cents; the
    * quantity threshold is exact cross-engine because l_quantity is
    * integral (its sum/avg are exact doubles) and both engines compute the
    * identical `avg * 0.2` product. */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1").select(col("p_partkey")))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .drop("p_partkey")
    val limits = li.groupBy(col("l_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_limit"))
    li.join(limits, "l_partkey")
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(
        round(sum(quantize(col("l_extendedprice"), 2)) / lit(700.0), 4)
          .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape — dormant high-balance customers: a GLOBAL scalar
    * threshold (average positive balance) gating an anti join, aggregated
    * per nation. The threshold is ONE broadcast row crossJoined in (the
    * repo's documented singleton idiom — allowlisted in PlanHygieneSpec
    * beside tc_mix_budget/ts_bm25_topk), and the comparison is cleared of
    * float boundaries entirely: `cents(bal) · n > Σcents` cross-multiplies
    * the average away, so both engines compare the same integers. Dormancy
    * = no order since 2000-01-01 (every customer has SOME order in the
    * testdata), an anti join against the date-pruned order scan. */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val stats = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(quantize(col("c_acctbal"), 2)).as("bal_cents_sum"),
        count(lit(1)).as("bal_n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(stats))
      .filter(quantize(col("c_acctbal"), 2) * col("bal_n") >
        col("bal_cents_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        centsSum(col("c_acctbal"), 2).as("totacctbal"))
  }

  /** TPC-H Q14 shape — promoted-revenue share: conditional aggregate ratio
    * over the lineitem⋈part equi join, one global output row. The ratio is
    * EXACT: both sums are integer scale-4 cents ([[quantize]] before the
    * aggregate) and the share is integral division in ppm — promoted to
    * DECIMAL(38,0) on the Spark side / HUGEINT on the oracle side because
    * promo_c·1e6 already exceeds 2^63 at sf0.01 money magnitudes. Scale:
    * part co-shuffles with lineitem on the part key (part is a true fact-dim
    * that grows with SF — not broadcastable at 100 TB; AQE may still choose
    * broadcast at small SF). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(col("l_partkey"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("rev_c"))
    li.join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L))
          .as("promo_c"),
        sum(col("rev_c")).as("total_c"))
      .select(
        round(col("promo_c") / lit(10000.0), 4).as("promo_revenue"),
        round(col("total_c") / lit(10000.0), 4).as("total_revenue"),
        expr("(CAST(promo_c AS DECIMAL(38,0)) * 1000000) div total_c")
          .as("promo_ppm"))
  }

  /** TPC-H Q15 shape — top supplier by windowed revenue: per-supplier exact
    * cents aggregate, the global max as a ONE-ROW broadcast singleton
    * (the repo's documented idiom, allowlisted in PlanHygieneSpec beside
    * q22/tc_mix_budget), equality filter back on the exact longs — ties
    * surface as multiple rows, deterministically, with no float boundary.
    * Supplier is a broadcast dim for the name lookup. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1996-07-01").cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(sum(quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .as("rev_c"))
    val top = rev.agg(max(col("rev_c")).as("max_c"))
    rev.crossJoin(broadcast(top))
      .filter(col("rev_c") === col("max_c"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_c") / lit(10000.0), 4).as("total_revenue"))
  }

  /** TPC-H Q19 shape — disjunction-of-conjunctions revenue: the OR-of-ANDs
    * predicate mixes part attributes (brand, size) with lineitem attributes
    * (quantity) across three arms. Catalyst derives the per-side
    * disjunctions — (brand∈…∧size≤…)∨… reaches the part SCAN as a pushed
    * filter, (qty ranges)∨… reaches the lineitem scan — then applies the
    * exact cross-side predicate after the equi join; no cartesian, both
    * scans pre-pruned. Revenue is exact integer cents. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("rev_c"))
    li.join(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 40)))
      .agg(centsTotal(col("rev_c"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21 shape — suppliers who kept orders waiting: STACKED semi+anti
    * on the same fact. A supplier's returned line on a finished multi-
    * supplier order qualifies iff some OTHER supplier shipped on that order
    * (EXISTS → left semi) and no OTHER supplier's line was also returned
    * (NOT EXISTS → left anti) — the hardest TPC-H join composition, and a
    * shape real training-data audits hit ("docs with a duplicate in another
    * shard but no canonical copy"). Adapted to the driver testdata: lineitem
    * carries no receipt/commit dates, so the per-line "problem" predicate is
    * `l_returnflag = 'R'` (the late-delivery stand-in); semantics of the
    * composition are unchanged. Both correlated subqueries become equi joins
    * on l_orderkey with a non-equi suppkey-inequality residual — shuffle on
    * the order key ×3, no cartesian; supplier is a broadcast dim. */
  def q21WaitingOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val problem = li.filter(col("l_returnflag") === "R")
    val l1 = problem
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .drop("o_orderkey")
    val others = li.select(col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val problemOthers = problem.select(col("l_orderkey").as("l3_orderkey"),
      col("l_suppkey").as("l3_suppkey"))
    l1.join(others, col("l_orderkey") === col("l2_orderkey") &&
        col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(problemOthers, col("l_orderkey") === col("l3_orderkey") &&
        col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q6 shape — the forecasting-revenue-change scan: a single-pass
    * filtered aggregate with EVERY predicate pushed to the parquet scan
    * (ship-date range, discount band, quantity cap — all scan-native
    * PushedFilters; at 100 TB this is the query shape that reads only the
    * row groups whose min/max stats intersect the band). The discount band
    * is float-safe WITHOUT leaving the pushable-literal form: discounts are
    * 2-dp multiples, so the 0.045/0.075 thresholds sit midway between
    * representable data points — no data value is within 4e-3 of a bound,
    * vs ~1e-17 representation error — and a quantize() spelling would cost
    * the pushdown (computed expressions never reach PushedFilters;
    * TpchPlanSpec pins all three predicates at the scan). Revenue =
    * Σ extendedprice·discount in exact scale-4 cents. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.045, 0.075) &&
        col("l_quantity") < 24.0)
      .agg(centsSum(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4 shape — order-priority checking: EXISTS decorrelated to a
    * left semi join (the reference's `_exists_in_db` pattern at order
    * grain), then a tiny groupBy over the 5-value priority domain.
    * Adapted like [[q21WaitingOrders]]: the testdata lineitem carries no
    * commit/receipt dates, so the per-line "problem" predicate is
    * `l_returnflag = 'R'`. The date filter prunes the orders scan before
    * the shuffle; the semi join shuffles on the order key only (no
    * payload duplication — semi output ≤ orders side). */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-04-01").cast("date"))
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** The Q8 target supplier nation (synthetic names in the test tables). */
  val Q8Nation = "NATION_3"

  /** TPC-H Q8 shape — national market share: the 8-relation join
    * (lineitem–part–orders–customer–nation–region + supplier–nation) with
    * a conditional-sum ratio per order year. Plan discipline: part
    * pre-filters on type and co-shuffles with lineitem on the part key
    * (a true fact-dim, not broadcastable at 100 TB — AQE may still pick
    * broadcast at small SF); the customer-side region gate and BOTH
    * nation lookups are broadcast dims; the date range prunes the orders
    * scan. The share itself is EXACT: volumes are scale-4 integer cents
    * and the ratio is integral ppm, promoted to DECIMAL(38,0)/HUGEINT
    * because nation_c·1e6 exceeds 2^63 at money magnitudes. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("vol_c"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val n2 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    li.join(Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(n2, col("s_nationkey").cast("int") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === Q8Nation, col("vol_c")).otherwise(0L))
          .as("nation_c"),
        sum(col("vol_c")).as("total_c"))
      .select(col("o_year"),
        round(col("nation_c") / lit(10000.0), 4).as("nation_volume"),
        round(col("total_c") / lit(10000.0), 4).as("total_volume"),
        expr("(CAST(nation_c AS DECIMAL(38,0)) * 1000000) div total_c")
          .as("mkt_share_ppm"))
  }

  /** TPC-H Q10 shape — returned-item reporting: GLOBAL top-k by exact
    * revenue. Aggregate-then-join discipline (the J8 N+1 fix): returned
    * lines collapse to per-customer cents BEFORE touching the customer
    * dim, so the join carries |active customers| rows, not |lineitem|.
    * The top-20 runs as `orderBy.limit` — Spark's TakeOrderedAndProject,
    * a per-partition heap + driver merge of 20-row heads, no global sort
    * shuffle at any SF. Determinism at the cut: revenue ties are exact
    * longs, broken by c_custkey, identically in the oracle's ORDER BY. */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("rev_c"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("date") &&
            col("o_orderdate") < lit("1997-01-01").cast("date"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_c")).as("rev_c"))
    perCust
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("rev_c").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 4).as("c_acctbal"),
        round(col("rev_c") / lit(10000.0), 4).as("revenue"))
  }

  /** TPC-H Q2 shape — min-cost supplier: the correlated "cost equals the
    * part's regional minimum" subquery, decorrelated into a two-level
    * aggregate + equality join-back. Adapted to the driver testdata (no
    * partsupp table): a supplier's offer price for a part is their cheapest
    * observed lineitem for it, in exact integer cents (`min` over quantized
    * longs — exact, so the join-back equality has no float boundary and
    * ties surface deterministically as extra rows, as in the spec). Plan
    * discipline: the region gate reduces supplier via broadcast nation ⋈
    * region BEFORE the offers aggregate (semi-shaped, suppkey only); part
    * pre-filters on type/size and equi-joins the offers on the part key;
    * the per-part minimum re-joins on (partkey, cost) — two shuffles on the
    * part key, both AQE-coalescible, no cartesian anywhere. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eurSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        quantize(col("l_extendedprice"), 2).as("price_c"))
      // dim filters BEFORE the pair aggregate: the type/size gate keeps ~4%
      // of parts and the region gate ~20% of suppliers, so the groupBy
      // shuffles only the surviving lines, not every (part, supp) pair
      .join(Tables.part(spark, dir)
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("s_acctbal"))
      .agg(min(col("price_c")).as("cost_c"))
    val mins = offers.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_c")).as("min_c"))
    offers.join(mins,
        col("p_partkey") === col("mk") && col("cost_c") === col("min_c"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal"), 4).as("s_acctbal"),
        round(col("cost_c") / lit(100.0), 4).as("cost"))
  }


  /** TPC-H Q9 shape — product-type profit: the 6-relation profit rollup
    * per (supplier nation, order year) over parts matching a name infix.
    * Adapted: no partsupp, so supply cost is the catalog-derived
    * `p_retailprice · l_quantity · 0.8` (2-dp price × integer qty × one
    * decimal digit = 3-dp fixed point — inside [[quantize]]'s scale-4
    * contract). Profit = rev_c − cost_c summed as exact longs. Plan: the
    * name filter prunes part BEFORE its equi join with lineitem (infix
    * `contains` reaches the scan as a pushed StringContains); orders joins
    * on the order key carrying only (key, year); supplier and nation are
    * broadcast dims. One final 2-key groupBy with map-side partials. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("rev_c"))
      .join(Tables.part(spark, dir).filter(col("p_name").contains("gear"))
          .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("rev_c") -
          quantize(col("p_retailprice") * col("l_quantity") * lit(0.8), 4))
          .as("profit_c"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(centsTotal(col("profit_c"), 4).as("sum_profit"))

  /** TPC-H Q11 shape — important stock: per-key value sums gated by a
    * GLOBAL share threshold (HAVING value > fraction × Σ value). Adapted:
    * value of a part inside one nation's supply chain = Σ exact price
    * cents over that nation's suppliers' lineitems. The global total is
    * ONE broadcast row crossJoined in (the repo's documented singleton
    * idiom, allowlisted in PlanHygieneSpec beside q15/q22), and the
    * 0.1%-share gate cross-multiplies the fraction away —
    * `value_c · 1000 > total_c` compares the same integers in both
    * engines, no float boundary. Supplier-nation gate is a broadcast
    * semi before the big aggregate, so the shuffle carries only the
    * gated nation's lines. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        quantize(col("l_extendedprice"), 2).as("price_c"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("price_c")).as("value_c"))
    val total = value.agg(sum(col("value_c")).as("total_c"))
    value.crossJoin(broadcast(total))
      // 0.02% share — cross-multiplied so both engines compare the same
      // longs; picked to stay non-empty AND selective at every driver SF
      // (the share distribution flattens as parts grow with SF)
      .filter(col("value_c") * lit(5000L) > col("total_c"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("value_c") / lit(100.0), 4).as("value"))
  }

  /** TPC-H Q12 shape — shipping-priority audit: conditional counts split
    * by order urgency, grouped over a small categorical domain. Adapted:
    * the testdata lineitem has no ship-mode column, so the audited
    * categories are the return flags 'A'/'R' (the IN-list gate reaches
    * the scan as a pushed filter beside the date window). The join
    * shuffles lineitem⋈orders on the order key carrying only (key,
    * priority); the CASE split is computed map-side into the 2-group
    * partial aggregate. Counts are longs on both engines (the oracle
    * casts DuckDB's HUGEINT sum back). */
  def q12PriorityLines(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date") &&
        col("l_returnflag").isin("A", "R"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q16 shape — parts/supplier relationship count: COUNT(DISTINCT
    * supplier) per part attribute triple, minus an exclusion list.
    * Adapted: the supplier↔part relation is the distinct (partkey,
    * suppkey) pairs observed in lineitem, and the "complaints" exclusion
    * is suppliers with negative balance — an anti join against a tiny
    * broadcast side (spelled NOT EXISTS in the oracle; DuckDB 1.0 has no
    * LEFT ANTI syntax). Plan: the pair-dedup is a partial-aggregating
    * groupBy on the pair key (map-side combine shrinks the shuffle to
    * the distinct pairs); part pre-filters brand/type/size before its
    * equi join; the final count-distinct re-shuffles on the attribute
    * triple. No cartesian, nothing non-broadcast on a small side. */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 shape — potential part promotion: the NESTED correlated
    * threshold (suppliers holding more than half a part's flow), composed
    * as aggregate → per-part singleton → threshold filter → semi join into
    * the supplier dim. Adapted: no partsupp/availqty, so a supplier
    * qualifies if for SOME name-prefixed part they shipped MORE THAN HALF
    * of that part's total 1997 volume (`qty·2 > total` — quantities are
    * integer-valued, so the double comparison is exact). The per-(supp,
    * part) and per-part aggregates share one shuffle key family (partkey);
    * the qualifying-supplier set semi-joins into supplier; region gate and
    * name lookup via broadcast nation. Output is the qualifying EUROPE
    * suppliers. */
  def q20PromotionSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val flows = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .join(Tables.part(spark, dir)
          .filter(col("p_name").startsWith("small"))
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val totals = flows.groupBy(col("l_partkey").as("tk"))
      .agg(sum(col("qty")).as("total_qty"))
    val qualifying = flows
      .join(totals, col("l_partkey") === col("tk"))
      .filter(col("qty") * lit(2.0) > col("total_qty"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q3 shape (canonical) — shipping priority: top-10 unshipped
    * orders by revenue for one market segment. Distinct from the regional
    * rollup [[q3RevenueByRegion]]: the groupBy key here is the HIGH-
    * CARDINALITY order key (at 100 TB, billions of groups — the aggregate
    * must stay fully distributed) and only the global cut is small. The
    * top-10 runs as `orderBy.limit` → TakeOrderedAndProject (per-partition
    * heap + driver merge of 10-row heads — no global sort shuffle).
    * Determinism at the cut: ordering on the EXACT cents long (ties broken
    * by orderkey), with the double division applied after the cut. The
    * segment gate prunes customer before its join; both date gates reach
    * their scans as pushed filters. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1997-06-01").cast("date")
    // segment semi-gate applies to orders BEFORE the lineitem join, so the
    // big orderkey shuffle carries only the ~20% surviving orders
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .join(Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        quantize(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("rev_c"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev_c")).as("rev_c"))
      .orderBy(col("rev_c").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        round(col("rev_c") / lit(10000.0), 4).as("revenue"))
  }

  val queries: Map[String, Q] = Map(
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q12_priority_lines" -> (q12PriorityLines _),
    "q16_supplier_count" -> (q16SupplierCount _),
    "q20_promotion_suppliers" -> (q20PromotionSuppliers _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_revenue" -> (q10ReturnedRevenue _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "q21_waiting_orders" -> (q21WaitingOrders _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q13_order_count_distribution" -> (q13OrderCountDistribution _),
    "q17_small_quantity_revenue" -> (q17SmallQuantityRevenue _),
    "q22_dormant_customers" -> (q22DormantCustomers _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q18_large_volume_customers" -> (q18LargeVolumeCustomers _),
    "q1_pricing_summary"   -> (q1PricingSummary _),
    "q1_sql_api"           -> (q1Sql _),
    "q_correlated_above_avg" -> (qCorrelatedAboveAvg _),
    "q3_revenue_by_region" -> (q3RevenueByRegion _),
    "j_semi_customers_with_orders"  -> (jSemiCustomersWithOrders _),
    "j_anti_customers_without_orders" -> (jAntiCustomersWithoutOrders _),
    "w1_latest_event_per_user" -> (w1LatestEventPerUser _),
    "a7_percentiles" -> (a7Percentiles _),
    "a1_decay_sum"   -> (a1DecaySum _))

  private val q1OracleSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  round(sum(l_quantity), 4) AS sum_qty,
       |  ${centsSumSql("l_extendedprice", 2)} AS sum_base_price,
       |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  round(avg(l_quantity), 6) AS avg_qty,
       |  round(avg(l_discount), 6) AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= DATE '1998-09-01'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(rev_c / CAST(10000 AS DOUBLE), 4) AS revenue
        |FROM (
        |  SELECT l_orderkey, o_orderdate, o_orderpriority,
        |    CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderdate < TIMESTAMP '1997-06-01'
        |    AND l_shipdate > TIMESTAMP '1997-06-01'
        |    AND EXISTS (SELECT 1 FROM customer
        |                WHERE c_custkey = o_custkey
        |                  AND c_mktsegment = 'BUILDING')
        |  GROUP BY 1, 2, 3)
        |ORDER BY rev_c DESC, l_orderkey LIMIT 10""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey AS p_partkey, s_name, n_name, s_acctbal,
        |    CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cost_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN eur ON l_suppkey = s_suppkey
        |  WHERE p_type = 'STANDARD' AND p_size <= 10
        |  GROUP BY 1, 2, 3, 4),
        |mins AS (
        |  SELECT p_partkey AS mk, min(cost_c) AS min_c FROM offers GROUP BY 1)
        |SELECT p_partkey, s_name, n_name, round(s_acctbal, 4) AS s_acctbal,
        |  round(cost_c / CAST(100 AS DOUBLE), 4) AS cost
        |FROM offers JOIN mins ON p_partkey = mk AND cost_c = min_c""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |  round(CAST(sum(
        |    CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000, 0) AS BIGINT)
        |    - CAST(round((p_retailprice * l_quantity * CAST(0.8 AS DOUBLE)) * 10000, 0) AS BIGINT)
        |  ) AS BIGINT) / CAST(10000 AS DOUBLE), 4) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, o_year""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem
        |  WHERE EXISTS (SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |                WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3')
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM v)
        |SELECT p_partkey, round(value_c / CAST(100 AS DOUBLE), 4) AS value
        |FROM v, t WHERE value_c * 5000 > total_c""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q20_promotion_suppliers" ->
      """WITH flows AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |totals AS (SELECT l_partkey AS tk, sum(qty) AS total_qty
        |           FROM flows GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND EXISTS (SELECT 1 FROM flows JOIN totals ON l_partkey = tk
        |              WHERE l_suppkey = s_suppkey AND qty * 2 > total_qty)""".stripMargin,
    "q6_forecast_revenue" ->
      s"""SELECT
        |  ${centsSumSql("l_extendedprice * l_discount", 4)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.045 AND 0.075
        |  AND l_quantity < 24""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1997-01-01'
        |  AND o_orderdate < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q8_market_share" ->
      s"""WITH j AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |    n2.n_name AS supp_nation,
        |    CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT) AS vol_c
        |  FROM lineitem
        |  JOIN part      ON l_partkey = p_partkey
        |  JOIN orders    ON l_orderkey = o_orderkey
        |  JOIN customer  ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region    ON n1.n_regionkey = r_regionkey
        |  JOIN supplier  ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |    AND o_orderdate >= DATE '1996-01-01'
        |    AND o_orderdate < DATE '1998-01-01'),
        |s AS (
        |  SELECT o_year,
        |    CAST(sum(CASE WHEN supp_nation = '$Q8Nation' THEN vol_c ELSE 0 END) AS BIGINT) AS nation_c,
        |    CAST(sum(vol_c) AS BIGINT) AS total_c
        |  FROM j GROUP BY o_year)
        |SELECT o_year,
        |  round(nation_c / CAST(10000 AS DOUBLE), 4) AS nation_volume,
        |  round(total_c / CAST(10000 AS DOUBLE), 4) AS total_volume,
        |  CAST((CAST(nation_c AS HUGEINT) * 1000000) // total_c AS BIGINT) AS mkt_share_ppm
        |FROM s""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name, round(c_acctbal, 4) AS c_acctbal,
        |  round(rev_c / CAST(10000 AS DOUBLE), 4) AS revenue
        |FROM (SELECT o_custkey,
        |        CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev_c
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_returnflag = 'R'
        |        AND o_orderdate >= DATE '1996-10-01'
        |        AND o_orderdate < DATE '1997-01-01'
        |      GROUP BY o_custkey)
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev_c DESC, c_custkey LIMIT 20""".stripMargin,
    "q1_sql_api" -> q1OracleSql,
    "q_correlated_above_avg" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS c_acctbal,
        |  round((SELECT avg(c2.c_acctbal) FROM customer c2
        |         WHERE c2.c_nationkey = c1.c_nationkey), 6) AS nation_avg
        |FROM customer c1
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)""".stripMargin,
    "q1_pricing_summary" -> q1OracleSql,
    "q5_local_supplier_volume" ->
      s"""SELECT n_name,
        |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q13_order_count_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q17_small_quantity_revenue" ->
      """WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        |li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |       FROM lineitem JOIN pp ON l_partkey = p_partkey),
        |lim AS (SELECT l_partkey, avg(l_quantity) * CAST(0.2 AS DOUBLE) AS qty_limit
        |        FROM li GROUP BY l_partkey)
        |SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |         / CAST(700 AS DOUBLE), 4) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM li JOIN lim USING (l_partkey)
        |WHERE l_quantity < qty_limit""".stripMargin,
    "q22_dormant_customers" ->
      s"""WITH stats AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents_sum,
        |    CAST(count(*) AS BIGINT) AS bal_n
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  ${centsSumSql("c_acctbal", 2)} AS totacctbal
        |FROM customer, stats
        |WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * bal_n > bal_cents_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_c,
        |    CAST(sum(rev_c) AS BIGINT) AS total_c
        |  FROM j)
        |SELECT round(promo_c / CAST(10000 AS DOUBLE), 4) AS promo_revenue,
        |  round(total_c / CAST(10000 AS DOUBLE), 4) AS total_revenue,
        |  CAST((CAST(promo_c AS HUGEINT) * 1000000) // total_c AS BIGINT) AS promo_ppm
        |FROM s""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(rev_c / CAST(10000 AS DOUBLE), 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_c = (SELECT max(rev_c) FROM rev)""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT
        |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q21_waiting_orders" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
        |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
        |    OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q18_large_volume_customers" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(o_totalprice, 4) AS o_totalprice, total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0) b
        |  ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q3_revenue_by_region" ->
      s"""SELECT r_name,
        |  ${centsSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "j_semi_customers_with_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "j_anti_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "w1_latest_event_per_user" ->
      """SELECT user_id, event_id AS latest_event_id,
        |  event_type AS latest_event_type, round(value, 4) AS latest_value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "a7_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50_value,
        |  round(quantile_cont(value, 0.95), 6) AS p95_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "a1_decay_sum" ->
      """SELECT user_id,
        |  round(least(greatest((exp(raw / 100.0 * 2.0) - 1.0) / (exp(raw / 100.0 * 2.0) + 1.0) * 100.0, 0.0), 100.0), 6) AS authority_score
        |FROM (SELECT user_id,
        |        sum(value * exp(date_diff('day', CAST(ts AS DATE), DATE '2025-01-01') / -90.0)) AS raw
        |      FROM events GROUP BY user_id)""".stripMargin)
}
