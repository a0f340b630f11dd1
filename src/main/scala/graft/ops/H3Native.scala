package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.H3Index

/** Hash-oracled queries over NATIVE H3 ids (VERDICT r13 item 2) — the
  * scheduler-key interop that previously required a representative point
  * ([[CellInterop]]) now runs directly on real H3 cell indexes for every
  * hierarchy operation: validity screening, resolution extraction, parent
  * re-keying (`h3.get_resolution` / parent joins, h3_scheduler.py:232-241)
  * and saturated-cell aperture-7 subdivision (`h3.cell_to_children`,
  * h3_scheduler.py:421-443). Geometry (`cell_to_latlng`) remains the one
  * documented boundary — see [[graft.expr.H3Index]] for why.
  *
  * Both engines compute the SAME bit algebra from one Scala generator
  * (dialects differ only in shift spelling: Spark `shiftright`/`shiftleft`
  * builtins vs DuckDB `>>`/`<<` operators — constants are emitted as
  * decimal literals so neither engine shifts past bit 48, the DuckDB
  * shift-overflow trap). The Spark side is pure codegen'd expressions: no
  * UDF, no shuffle — per-row index math that vectorizes at any scale, and
  * the produced keys are immediately usable as join/partition keys.
  */
object H3Native {

  // ------------------------------------------------------------- fixture

  /** The H3 documentation's worked-example family (real cells: the res-9
    * cell over downtown San Francisco, its res-8 parent, and that parent's
    * seven res-9 children — the canonical public parent/children example),
    * plus structurally derived finer descendants and deliberately broken
    * ids covering each validity rule. Built through [[H3Index]], whose own
    * bit layout is pinned against the same published examples in
    * H3IndexSpec — so fixture provenance and engine math are cross-checked
    * but the QUERY math below is re-derived independently in both SQL
    * dialects. */
  val DocCell = "8928308280fffff"
  val fixtureIds: Seq[String] = {
    val n = H3Index.parse(DocCell)
    val parent8 = H3Index.parent(n, 8)
    val docFamily = Seq(DocCell, H3Index.format(parent8)) ++
      H3Index.children(parent8, 9).map(H3Index.format)
    val derived = Seq(
      H3Index.format(H3Index.centerChild(n, 10)),
      H3Index.format(H3Index.centerChild(n, 11))) ++
      H3Index.children(n, 10).take(3).map(H3Index.format)
    val pent = (1L << 59) | (9L << 52) | (4L << 45) | ((1L << 18) - 1)
    val pentagons = Seq(
      H3Index.format(pent), // res-9 pentagon (base cell 4, all digits 0)
      // digit path 2 then 1: first non-zero digit is 2 → valid hexagon child
      H3Index.format((pent & ~(0x7L << 42) & ~(0x7L << 39)) | (2L << 42) | (1L << 39)))
    val invalid = Seq(
      "4928308280fffff", // mode 0 (not a cell index)
      "f928308280fffff", // reserved bits 56-58 set
      H3Index.format((n & ~(0x7FL << 45)) | (127L << 45)), // base cell 127 >= 122
      H3Index.format(n | (0x7L << (45 - 3 * 3))),          // digit 3 = 7 before res
      H3Index.format(n & ~(0x4L << (45 - 3 * 12))),        // digit 12 = 3 after res
      H3Index.format((pent & ~(0x7L << 42)) | (1L << 42))) // pentagon first digit 1
    docFamily ++ derived ++ pentagons ++ invalid
  }

  // ------------------------------------- one generator, two SQL dialects

  private case class Dialect(shr: (String, String) => String,
      shl: (String, String) => String)
  private val SparkD = Dialect(
    (x, k) => s"shiftright($x, $k)", (x, k) => s"shiftleft($x, $k)")
  private val DuckD = Dialect(
    (x, k) => s"($x >> $k)", (x, k) => s"($x << $k)")

  /** Fully parenthesized (DuckDB gives `|`/`&`/`<<` EQUAL precedence). */
  private def digitSql(d: Dialect, n: String, i: Int): String =
    s"(${d.shr(n, (45 - 3 * i).toString)} & 7)"
  private def resSql(d: Dialect, n: String): String = s"(${d.shr(n, "52")} & 15)"
  private def baseSql(d: Dialect, n: String): String = s"(${d.shr(n, "45")} & 127)"

  private val PentList = H3Index.PentagonBaseCells.toSeq.sorted.mkString(", ")

  /** First non-zero digit within the cell's own resolution (0 if all zero)
    * — digits beyond res are 7s and must not be picked up, hence the
    * res-guard on every rung. */
  private def firstNonzeroDigitSql(d: Dialect, n: String, res: String): String = {
    val rungs = (1 to H3Index.MaxRes).map { i =>
      s"WHEN $res >= $i AND ${digitSql(d, n, i)} <> 0 THEN ${digitSql(d, n, i)}"
    }.mkString(" ")
    s"(CASE $rungs ELSE 0 END)"
  }

  private def isPentagonSql(d: Dialect, n: String, res: String): String =
    s"(${baseSql(d, n)} IN ($PentList) AND ${firstNonzeroDigitSql(d, n, res)} = 0)"

  private def isValidSql(d: Dialect, n: String, res: String): String = {
    val digitRules = (1 to H3Index.MaxRes).map { i =>
      s"(CASE WHEN $res >= $i THEN ${digitSql(d, n, i)} <= 6" +
        s" ELSE ${digitSql(d, n, i)} = 7 END)"
    }.mkString(" AND ")
    s"((${d.shr(n, "59")} & 15) = ${H3Index.ModeCell}" +
      s" AND (${d.shr(n, "56")} & 7) = 0" +
      s" AND ${baseSql(d, n)} < ${H3Index.NumBaseCells}" +
      s" AND $digitRules" +
      s" AND (${baseSql(d, n)} NOT IN ($PentList)" +
      s" OR ${firstNonzeroDigitSql(d, n, res)} <> 1))"
  }

  /** Coarsen by one: blank the res-th digit to 7, decrement the res field.
    * `resClear` is the precomputed ~(15<<52) mask as a decimal literal. */
  private val ResClear: Long = ~(0xFL << 52)
  private def parentSql(d: Dialect, n: String, res: String): String = {
    val lowMask = s"(${d.shl("CAST(1 AS BIGINT)", s"(3 * (16 - $res))")} - 1)"
    s"((($n | $lowMask) & $ResClear) | ${d.shl(s"($res - 1)", "52")})"
  }

  /** Refine by one: set the res field to res+1 and digit res+1 to `dig`. */
  private def childSql(d: Dialect, n: String, res: String, dig: String): String = {
    val pos = s"(42 - (3 * $res))"
    s"(((($n & $ResClear) | ${d.shl(s"($res + 1)", "52")})" +
      s" & (-1 - ${d.shl("CAST(7 AS BIGINT)", pos)}))" +
      s" | ${d.shl(s"CAST($dig AS BIGINT)", pos)})"
  }

  private def fmtSparkSql(n: String): String = s"lower(lpad(hex($n), 15, '0'))"
  private def fmtDuckSql(n: String): String = s"lower(lpad(hex($n), 15, '0'))"

  // ------------------------------------------------------------- queries

  /** Validity + resolution + base cell + pentagon flag + one-level parent
    * for every fixture id — the screening/re-keying projection a consumer
    * of `ingestion_cell_h3.h3` runs before joining scheduler state. */
  def qH3NativeOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = SparkD
    fixtureIds.toDF("h3")
      .withColumn("n", conv(col("h3"), 16, 10).cast("long"))
      .withColumn("res0", expr(resSql(d, "n")))
      .withColumn("is_valid", expr(isValidSql(d, "n", "res0")))
      .select(col("h3"),
        col("is_valid"),
        when(col("is_valid"), col("res0")).as("res"),
        when(col("is_valid"), expr(baseSql(d, "n"))).as("base_cell"),
        when(col("is_valid"), expr(isPentagonSql(d, "n", "res0"))).as("is_pentagon"),
        when(col("is_valid") && col("res0") > 0,
          expr(fmtSparkSql(parentSql(d, "n", "res0")))).as("parent_h3"))
  }

  /** Saturation ladder on NATIVE keys (h3_scheduler.py:421-443 +
    * config res 9→11): a cell whose last scan hit the 60-result cap splits
    * into its aperture-7 children at the next resolution (6 under a
    * pentagon — digit 1 is the deleted subsequence); an unsaturated or
    * max-res cell keeps itself. One narrow explode, no shuffle; children
    * inherit nothing but the key, exactly the reference's insert shape. */
  val ScanCap = 60
  val MaxSchedRes = 11
  def qH3SubdivideSaturated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = SparkD
    val state = schedulerState.toDF("h3", "results_last")
    state
      .withColumn("n", conv(col("h3"), 16, 10).cast("long"))
      .withColumn("res", expr(resSql(d, "n")))
      .withColumn("is_pent", expr(isPentagonSql(d, "n", "res")))
      .withColumn("splits",
        col("results_last") >= ScanCap && col("res") < MaxSchedRes)
      .withColumn("dig", explode(sequence(lit(-1), lit(6))))
      // dig -1 = the keep-self row; digs 0..6 only when splitting (1 dropped
      // under a pentagon)
      .filter((col("dig") === -1 && !col("splits")) ||
        (col("dig") >= 0 && col("splits") && !(col("is_pent") && col("dig") === 1)))
      .select(col("h3"),
        when(col("dig") === -1, lit("keep")).otherwise(lit("split")).as("action"),
        when(col("dig") === -1, col("h3"))
          .otherwise(expr(fmtSparkSql(childSql(d, "n", "res", "dig")))).as("cell_out"),
        when(col("dig") === -1, col("res")).otherwise(col("res") + 1).as("res_out"))
  }

  /** PARENT ROLLUP at a fixed resolution — the scheduler's "how is this
    * parent area doing overall" readout (the reference stores `parent_h3`
    * on every cell row, h3_scheduler.py:140-151, and walks the hierarchy
    * when deciding splits): children at res 9–11 coarsen to their res-9
    * ancestor with ONE constant-mask expression (blanking digits 10..15 to
    * 7 needs no per-row loop when the target res is fixed), then an
    * ordinary groupBy on the parent key. This is the native-H3 form of the
    * aggregate-then-join pattern every cell-keyed rollup uses. */
  val RollupRes = 9
  def qH3ParentRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = SparkD
    // constant masks for "parent at res 9": set digits 10..15 to 7, res to 9
    val low = (1L << (3 * (H3Index.MaxRes - RollupRes))) - 1
    val resField = RollupRes.toLong << 52
    val state = rollupState.toDF("h3", "results_last")
    state
      .withColumn("n", conv(col("h3"), 16, 10).cast("long"))
      .withColumn("res", expr(resSql(d, "n")))
      .filter(col("res") >= RollupRes)
      .withColumn("p9", expr(s"(((n | $low) & $ResClear) | $resField)"))
      .groupBy(expr(fmtSparkSql("p9")).as("parent_h3"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("results_last")).as("total_results"),
        sum(when(col("results_last") >= ScanCap, 1L).otherwise(0L)).as("n_saturated"),
        max(col("res")).as("max_res"))
  }

  /** Rollup fixture: the res-9 doc cell, two of its res-10 children, a
    * res-11 grandchild, a SIBLING res-9 cell with its own child, and the
    * pentagon — three distinct res-9 parents in the output. */
  val rollupState: Seq[(String, Int)] = {
    val n = H3Index.parse(DocCell)
    val sib = H3Index.children(H3Index.parent(n, 8), 9).filter(_ != n).head
    Seq(
      (DocCell, 60),
      (H3Index.format(H3Index.children(n, 10).head), 44),
      (H3Index.format(H3Index.children(n, 10)(1)), 71),
      (H3Index.format(H3Index.centerChild(n, 11)), 12),
      (H3Index.format(sib), 9),
      (H3Index.format(H3Index.children(sib, 10)(2)), 63),
      (H3Index.format((1L << 59) | (9L << 52) | (4L << 45) | ((1L << 18) - 1)), 64))
  }

  /** VOLUME variant of the screening projection: 100k structurally valid
    * res-9 ids GENERATED from a row index by identical integer arithmetic
    * in both engines (base cell fixed to the doc cell's hexagon base;
    * digits 1..9 decoded base-7 from the index, so ids are distinct and
    * every digit value occurs), then the same validity/res/base/parent
    * algebra as [[qH3NativeOps]], aggregated per leading digit so the
    * hashed output stays small while every row's math feeds it. Pure
    * per-row codegen'd expressions — the 100 TB path is exactly this shape,
    * just more partitions. */
  val VolN = 100000L
  def qH3RekeyVol(spark: SparkSession, dir: String): DataFrame = {
    val d = SparkD
    val digitTerms = (1 to 9).map { i =>
      // digit_i = (id / 7^(9-i)) % 7 placed at bit position 45 - 3i
      val pow = math.pow(7, 9 - i).toLong
      s"(((id div $pow) % 7) * ${1L << (45 - 3 * i)})"
    }.mkString(" + ")
    val base = ((1L << 59) | (9L << 52) | (20L << 45) | ((1L << 18) - 1))
    spark.range(VolN).toDF("id")
      .withColumn("n", expr(s"$base + $digitTerms").cast("long"))
      .withColumn("res", expr(resSql(d, "n")))
      .withColumn("ok", expr(isValidSql(d, "n", "res")))
      .withColumn("d9", expr(digitSql(d, "n", 9)))
      .withColumn("p8", expr(parentSql(d, "n", "res")))
      .groupBy(col("d9"))
      .agg(count(lit(1)).as("n_ids"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_valid"),
        countDistinct(col("p8")).as("n_parents"),
        sum(col("n") % 1000000007L).as("id_checksum"))
  }

  /** Scheduler-state fixture: doc-family cells + the pentagon, mixing
    * saturated (>= 60), unsaturated, and a saturated max-res cell. */
  val schedulerState: Seq[(String, Int)] = {
    val n = H3Index.parse(DocCell)
    Seq(
      (DocCell, 60),                                     // saturated res 9 → 7 children
      (H3Index.format(H3Index.parent(n, 8)), 12),        // quiet res 8 → keep
      (H3Index.format(H3Index.centerChild(n, 10)), 71),  // saturated res 10 → split
      (H3Index.format(H3Index.centerChild(n, 11)), 99),  // saturated AT max res → keep
      (H3Index.format((1L << 59) | (9L << 52) | (4L << 45) | ((1L << 18) - 1)),
        64))                                             // saturated pentagon → 6 children
  }

  // ------------------------------------------------------------- oracles

  private def idValues: String =
    fixtureIds.map(id => s"('$id')").mkString("(VALUES ", ", ", ") AS t(h3)")

  private def stateValues: String =
    schedulerState.map { case (id, r) => s"('$id', $r)" }
      .mkString("(VALUES ", ", ", ") AS t(h3, results_last)")

  private def rollupValues: String =
    rollupState.map { case (id, r) => s"('$id', $r)" }
      .mkString("(VALUES ", ", ", ") AS t(h3, results_last)")

  val queries: Map[String, Relational.Q] = Map(
    "h3_native_ops" -> (qH3NativeOps _),
    "h3_subdivide_saturated" -> (qH3SubdivideSaturated _),
    "h3_parent_rollup" -> (qH3ParentRollup _),
    "h3_rekey_vol" -> (qH3RekeyVol _))

  val oracles: Map[String, String] = {
    val d = DuckD
    Map(
      "h3_native_ops" ->
        s"""WITH p AS (
           |  SELECT h3, CAST(('0x' || h3) AS BIGINT) AS n FROM $idValues),
           |r AS (SELECT h3, n, ${resSql(d, "n")} AS res0 FROM p),
           |v AS (SELECT h3, n, res0, ${isValidSql(d, "n", "res0")} AS is_valid FROM r)
           |SELECT h3, is_valid,
           |  CASE WHEN is_valid THEN res0 END AS res,
           |  CASE WHEN is_valid THEN ${baseSql(d, "n")} END AS base_cell,
           |  CASE WHEN is_valid THEN ${isPentagonSql(d, "n", "res0")} END AS is_pentagon,
           |  CASE WHEN is_valid AND res0 > 0
           |    THEN ${fmtDuckSql(parentSql(d, "n", "res0"))} END AS parent_h3
           |FROM v""".stripMargin,
      "h3_subdivide_saturated" ->
        s"""WITH p AS (
           |  SELECT h3, results_last, CAST(('0x' || h3) AS BIGINT) AS n
           |  FROM $stateValues),
           |r AS (
           |  SELECT h3, results_last, n, ${resSql(d, "n")} AS res,
           |    ${isPentagonSql(d, "n", s"${resSql(d, "n")}")} AS is_pent,
           |    (results_last >= $ScanCap AND ${resSql(d, "n")} < $MaxSchedRes) AS splits
           |  FROM p),
           |x AS (
           |  SELECT r.*, d.dig
           |  FROM r CROSS JOIN (SELECT unnest(generate_series(-1, 6)) AS dig) d
           |  WHERE (dig = -1 AND NOT splits)
           |     OR (dig >= 0 AND splits AND NOT (is_pent AND dig = 1)))
           |SELECT h3,
           |  CASE WHEN dig = -1 THEN 'keep' ELSE 'split' END AS action,
           |  CASE WHEN dig = -1 THEN h3
           |    ELSE ${fmtDuckSql(childSql(d, "n", "res", "dig"))} END AS cell_out,
           |  CAST(CASE WHEN dig = -1 THEN res ELSE res + 1 END AS BIGINT) AS res_out
           |FROM x""".stripMargin,
      "h3_parent_rollup" -> {
        val low = (1L << (3 * (H3Index.MaxRes - RollupRes))) - 1
        val resField = RollupRes.toLong << 52
        s"""WITH p AS (
           |  SELECT h3, results_last, CAST(('0x' || h3) AS BIGINT) AS n
           |  FROM $rollupValues),
           |r AS (SELECT h3, results_last, n, ${resSql(d, "n")} AS res FROM p)
           |SELECT ${fmtDuckSql(s"(((n | $low) & $ResClear) | $resField)")} AS parent_h3,
           |  count(*) AS n_cells,
           |  CAST(sum(results_last) AS BIGINT) AS total_results,
           |  CAST(sum(CASE WHEN results_last >= $ScanCap THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_saturated,
           |  CAST(max(res) AS BIGINT) AS max_res
           |FROM r WHERE res >= $RollupRes GROUP BY 1""".stripMargin
      },
      "h3_rekey_vol" -> {
        val digitTerms = (1 to 9).map { i =>
          val pow = math.pow(7, 9 - i).toLong
          s"(((id // $pow) % 7) * ${1L << (45 - 3 * i)})"
        }.mkString(" + ")
        val base = (1L << 59) | (9L << 52) | (20L << 45) | ((1L << 18) - 1)
        s"""WITH g AS (SELECT unnest(generate_series(0, ${VolN - 1})) AS id),
           |n0 AS (SELECT id, CAST($base + $digitTerms AS BIGINT) AS n FROM g),
           |r AS (SELECT id, n, ${resSql(d, "n")} AS res FROM n0)
           |SELECT ${digitSql(d, "n", 9)} AS d9, count(*) AS n_ids,
           |  CAST(sum(CASE WHEN ${isValidSql(d, "n", "res")} THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_valid,
           |  CAST(count(DISTINCT ${parentSql(d, "n", "res")}) AS BIGINT) AS n_parents,
           |  CAST(sum(n % 1000000007) AS BIGINT) AS id_checksum
           |FROM r GROUP BY 1""".stripMargin
      })
  }
}
