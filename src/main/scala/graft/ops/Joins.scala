package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .agg(count(lit(1)).as("n_big_orders"),
        round(sum(col("o_totalprice") - col("c_acctbal")), 4).as("sum_excess"))
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

  /** J5 — similarity join (matching.py:74-201): trigram over normalized names
    * on a broadcast probe side, best match per probe via deterministic window.
    * Uses the custom codegen'd expressions (normalize_text, trigram_similarity,
    * name_score) — not SQL-expressible, so the driver records a rows-only check;
    * exact semantics are pinned by TextAlgoSpec golden vectors. */
  def j5SimilarityJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.expr.{functions => F}
    import org.apache.spark.sql.expressions.Window
    // normalize ONCE per side before the join (round 1 re-normalized the part
    // name per probe and the probe per part row), and defer the expensive
    // name_score (Ratcliff-Obershelp ×3) until after the per-probe top-1
    // filter — it then runs on 3 rows, not |part|×|probes|
    val probes = Seq("cold widgett", "larg bolt", "standart gadget").toDF("probe")
      .withColumn("probe_norm", F.normalize_text(col("probe")))
    val parts = Tables.part(spark, dir)
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

  val queries: Map[String, Relational.Q] = Map(
    "j_theta_price_vs_acctbal" -> (jThetaPriceVsAcctbal _),
    "j_range_quantity_size" -> (jRangeQuantitySize _),
    "j_contains_tokens" -> (jContainsTokens _),
    "j5_similarity_join" -> (j5SimilarityJoin _))

  val oracles: Map[String, String] = Map(
    "j_theta_price_vs_acctbal" ->
      """SELECT c_nationkey, count(*) AS n_big_orders,
        |  round(sum(o_totalprice - c_acctbal), 4) AS sum_excess
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
        |GROUP BY token""".stripMargin)
}
