package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked batch queries for the cell FSM (P8 + the §2.9 transition). */
object FsmQueries {

  /** (h3, res, status, saturated, next_due_at, results_last, attempts). */
  val cells: Seq[(String, Int, String, Boolean, Option[String], Option[Int], Int)] = Seq(
    ("h9:100:200", 9, "pending", false, None, None, 0),
    ("h9:101:200", 9, "pending", false, None, None, 0),
    ("h9:102:200", 9, "scanned", false, Some("2025-05-20 00:00:00"), Some(12), 1),
    ("h11:400:800", 11, "scanned", false, Some("2025-05-25 00:00:00"), Some(40), 2),
    ("h9:103:200", 9, "split", true, None, Some(80), 3))

  /** (h3, total_results, max_category_count, as_of): saturating scan on a
    * res-9 cell (split), normal scan, saturating scan at max res (no split). */
  val scans: Seq[(String, Int, Int, String)] = Seq(
    ("h9:100:200", 70, 25, "2025-06-01 00:00:00"),
    ("h9:101:200", 30, 10, "2025-06-01 00:00:00"),
    ("h11:400:800", 80, 30, "2025-06-01 00:00:00"))

  def cellsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cells.toDF("h3", "res", "status", "saturated", "next_due_at", "results_last", "attempts")
      .withColumn("next_due_at", to_timestamp(col("next_due_at")))
      .withColumn("last_scanned_at", lit(null).cast("timestamp"))
  }

  def scansDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scans.toDF("h3", "total_results", "max_category_count", "as_of")
  }

  def qFsmStep(spark: SparkSession, dir: String): DataFrame =
    CellFsm.step(cellsDf(spark), scansDf(spark))
      .select(col("h3"), col("res").cast("long").as("res"), col("status"),
        col("saturated"),
        date_format(col("next_due_at"), "yyyy-MM-dd").as("next_due_date"),
        col("results_last").cast("long").as("results_last"),
        col("attempts").cast("long").as("attempts"))

  def qDueCells(spark: SparkSession, dir: String): DataFrame =
    CellFsm.selectDueCells(cellsDf(spark), "2025-06-01 00:00:00", 3)
      .select(col("h3"), col("res").cast("long").as("res"), col("status"))

  // ---------------------------------------------- multi-step convergence

  /** Deterministic "now" for the convergence run; round k scans at base+k
    * days, so each cell's next_due_at pins the round it was scanned in. */
  val ConvergeBase = "2025-06-01 00:00:00"

  /** Convergence seeds (axial coords at res 9): two saturate and split under
    * [[convergeScans]]' predicate, one is a quiet leaf. */
  val convergeSeeds: Seq[(Long, Long)] = Seq((0L, 0L), (5L, -3L), (-2L, 7L))

  def convergeSeedsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    convergeSeeds.map { case (q, r) => (s"h9:$q:$r", 9) }
      .toDF("h3", "res")
      .withColumn("status", lit("pending"))
      .withColumn("saturated", lit(false))
      .withColumn("last_scanned_at", lit(null).cast("timestamp"))
      .withColumn("next_due_at", lit(null).cast("timestamp"))
      .withColumn("results_last", lit(null).cast("int"))
      .withColumn("attempts", lit(0))
  }

  /** Deterministic scan results for the PENDING cells: saturation is a pure
    * function of the cell's axial coords — ((5q+3r) mod 7) < satMod (default
    * 3) — so the DuckDB recursive CTE can replay the whole cascade; scan
    * time advances one day per resolution level. StreamingSpec's
    * state-store volume test reuses the same generator with satMod = 1 to
    * bound the 10k-seed fan-out. */
  def convergeScans(cells: DataFrame, satMod: Int = 3): DataFrame = {
    val parts = split(col("h3"), ":")
    val q = element_at(parts, 2).cast("long")
    val r = element_at(parts, 3).cast("long")
    val sat = ((q * 5 + r * 3) % 7 + 7) % 7 < satMod
    cells.filter(col("status") === "pending")
      .select(col("h3"),
        when(sat, 70).otherwise(30).as("total_results"),
        lit(5).as("max_category_count"),
        date_format(expr(s"timestampadd(DAY, CAST(res - 9 AS INT), TIMESTAMP '$ConvergeBase')"),
          "yyyy-MM-dd HH:mm:ss").as("as_of"))
  }

  /** The reference's adaptive-partitioning LOOP (h3_scheduler.py:419-493,
    * google_places_ingester.py:741-749) run to its FIXPOINT: iterate
    * [[CellFsm.step]] from saturated res-9 seeds until no cell is pending —
    * saturated cells split down to the res-11 cap, where they park as
    * 'saturated'. Each iteration is one distributed batch; the driver loop
    * runs at most MaxRes-MinRes+1 times (resolution is strictly increasing),
    * which is the same O(log) round count a 1000-executor run would do.
    * localCheckpoint truncates the growing lineage between rounds. */
  def qFsmConverge(spark: SparkSession, dir: String): DataFrame = {
    val cells = convergeFixpoint(convergeSeedsDf(spark))
    cells.select(col("h3"), col("res").cast("long").as("res"), col("status"),
      col("saturated"),
      date_format(col("next_due_at"), "yyyy-MM-dd").as("next_due_date"),
      col("results_last").cast("long").as("results_last"),
      col("attempts").cast("long").as("attempts"))
  }

  /** The fixpoint loop over an arbitrary seed table — shared by the declared
    * query (3 seeds, full oracle) and StreamingSpec's 10k-seed state-store
    * parity test. */
  private[graft] def convergeFixpoint(seeds: DataFrame, satMod: Int = 3): DataFrame = {
    var cells = seeds
    var pending = 1L
    var guard = 0
    while (pending > 0 && guard <= graft.expr.CellGrid.MaxRes - 9) {
      cells = CellFsm.step(cells, convergeScans(cells, satMod)).localCheckpoint()
      pending = cells.filter(col("status") === "pending").count()
      guard += 1
    }
    cells
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fsm_cell_step" -> (qFsmStep _),
    "fsm_cell_converge" -> (qFsmConverge _),
    "p8_due_cells" -> (qDueCells _))

  private def cellValues: String = cells.map { case (h, r, st, sat, nd, rl, at) =>
    val nds = nd.map(v => s"TIMESTAMP '$v'").getOrElse("CAST(NULL AS TIMESTAMP)")
    val rls = rl.map(_.toString).getOrElse("CAST(NULL AS INTEGER)")
    s"('$h', $r, '$st', $sat, $nds, $rls, $at)"
  }.mkString("(VALUES ", ", ", ")") +
    " AS c(h3, res, status, saturated, next_due_at, results_last, attempts)"

  private def scanValues: String = scans.map { case (h, t, m, a) =>
    s"('$h', $t, $m, TIMESTAMP '$a')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS s(h3, total_results, max_category_count, as_of)"

  val oracles: Map[String, String] = Map(
    "fsm_cell_step" ->
      s"""WITH j AS (
         |  SELECT c.*, s.total_results, s.max_category_count, s.as_of,
         |    (s.total_results IS NOT NULL AND
         |     (s.total_results >= 60 OR s.max_category_count >= 20)) AS sat,
         |    (s.total_results IS NOT NULL AND
         |     (s.total_results >= 60 OR s.max_category_count >= 20) AND c.res < 11) AS splits
         |  FROM $cellValues LEFT JOIN $scanValues ON c.h3 = s.h3),
         |updated AS (
         |  SELECT h3, CAST(res AS BIGINT) AS res,
         |    CASE WHEN total_results IS NULL THEN status
         |         WHEN splits THEN 'split'
         |         WHEN sat THEN 'saturated' ELSE 'scanned' END AS status,
         |    CASE WHEN total_results IS NULL THEN saturated ELSE sat END AS saturated,
         |    CASE WHEN total_results IS NULL THEN strftime(next_due_at, '%Y-%m-%d')
         |         WHEN splits OR sat THEN strftime(next_due_at, '%Y-%m-%d')
         |         ELSE strftime(as_of + INTERVAL 7 DAY, '%Y-%m-%d') END AS next_due_date,
         |    CAST(CASE WHEN total_results IS NULL THEN results_last
         |         ELSE total_results END AS BIGINT) AS results_last,
         |    CAST(CASE WHEN total_results IS NULL THEN attempts
         |         ELSE attempts + 1 END AS BIGINT) AS attempts
         |  FROM j),
         |children AS (
         |  -- aperture-7 hex children: center child M.(q,r) with M=[[3,1],[-1,2]]
         |  -- plus its 6 axial neighbors (CellGrid.cellToChildren)
         |  SELECT 'h' || (res + 1) || ':' ||
         |      (3 * CAST(string_split(h3, ':')[2] AS BIGINT)
         |         + CAST(string_split(h3, ':')[3] AS BIGINT) + dq) || ':' ||
         |      (-CAST(string_split(h3, ':')[2] AS BIGINT)
         |         + 2 * CAST(string_split(h3, ':')[3] AS BIGINT) + dr) AS h3,
         |    CAST(res + 1 AS BIGINT) AS res, 'pending' AS status, false AS saturated,
         |    CAST(NULL AS VARCHAR) AS next_due_date,
         |    CAST(NULL AS BIGINT) AS results_last, CAST(0 AS BIGINT) AS attempts
         |  FROM j, (VALUES (0, 0), (1, 0), (0, 1), (-1, 0), (0, -1), (1, -1), (-1, 1)) AS d(dq, dr)
         |  WHERE splits)
         |SELECT * FROM updated UNION ALL SELECT * FROM children""".stripMargin,
    "fsm_cell_converge" ->
      // the full cascade as a recursive CTE: child generation replays the
      // aperture-7 math (center M.(q,r) + 6 axial neighbors, as pinned by
      // fsm_cell_step) and the saturation predicate is the same pure
      // function of (q, r) both engines compute; every cell is scanned in
      // round (res - 9), so attempts = 1 and next_due = scan day + 7
      s"""WITH RECURSIVE tree(res, q, r) AS (
         |  SELECT 9, q, r FROM (VALUES ${convergeSeeds.map { case (q, r) => s"($q, $r)" }.mkString(", ")}) AS s(q, r)
         |  UNION ALL
         |  SELECT t.res + 1, 3 * t.q + t.r + d.dq, -t.q + 2 * t.r + d.dr
         |  FROM tree t, (VALUES (0, 0), (1, 0), (0, 1), (-1, 0), (0, -1), (1, -1), (-1, 1)) AS d(dq, dr)
         |  WHERE ((t.q * 5 + t.r * 3) % 7 + 7) % 7 < 3 AND t.res < 11),
         |scanned AS (
         |  SELECT res, q, r, ((q * 5 + r * 3) % 7 + 7) % 7 < 3 AS sat FROM tree)
         |SELECT 'h' || res || ':' || q || ':' || r AS h3,
         |  CAST(res AS BIGINT) AS res,
         |  CASE WHEN sat AND res < 11 THEN 'split'
         |       WHEN sat THEN 'saturated' ELSE 'scanned' END AS status,
         |  sat AS saturated,
         |  CASE WHEN sat THEN NULL
         |       ELSE strftime(TIMESTAMP '$ConvergeBase' + INTERVAL ((res - 9) + 7) DAY, '%Y-%m-%d')
         |       END AS next_due_date,
         |  CAST(CASE WHEN sat THEN 70 ELSE 30 END AS BIGINT) AS results_last,
         |  CAST(1 AS BIGINT) AS attempts
         |FROM scanned""".stripMargin,
    "p8_due_cells" ->
      s"""SELECT h3, CAST(res AS BIGINT) AS res, status FROM $cellValues
         |WHERE status != 'split'
         |  AND (next_due_at IS NULL OR next_due_at <= TIMESTAMP '2025-06-01 00:00:00')
         |ORDER BY res ASC, next_due_at ASC NULLS FIRST, h3 ASC LIMIT 3""".stripMargin)
}
