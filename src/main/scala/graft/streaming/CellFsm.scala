package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.expr.CellGrid

/** Cell-scheduler state machine (SURVEY §2.9; reference:
  * h3_scheduler.py:256-267 saturation, :419-493 subdivision, :495-543 TTL
  * update; config: 60 results/cell cap, 20 per-category cap, res 9→11,
  * 7-day rescan).
  *
  * Two implementations of the SAME transition function:
  *  - [[step]]: batch — state table ⋈ scan results, one select + child union;
  *    at scale this is the MERGE-based incremental job.
  *  - [[streamingFsm]]: Structured Streaming — `flatMapGroupsWithState` keyed
  *    by cell id with the cell's state persisted in the state store; split
  *    emits child PENDING rows (new keys) downstream.
  */
object CellFsm {

  val ScanCapPerCell = 60
  val CategoryCap = 20
  val RescanDays = 7

  /** The FSM's only grid dependency — resolution, ladder cap, subdivision —
    * behind an adapter so the SAME transition function runs on engine
    * CellGrid keys or on REAL H3 cell indexes ([[graft.expr.H3Index]]):
    * the reference's `ingestion_cell_h3.h3` ids drive the state machine
    * without any re-keying. */
  trait CellIndex extends Serializable {
    def res(id: String): Int
    def maxRes: Int
    def children(id: String): Seq[String]
  }
  object CellGridIndex extends CellIndex {
    def res(id: String): Int = CellGrid.cellRes(id)
    def maxRes: Int = CellGrid.MaxRes
    def children(id: String): Seq[String] = CellGrid.cellToChildren(id).toSeq
  }
  /** Real-H3 keyspace; the ladder cap is the reference's config max_res
    * (config.py:121), not H3's own res-15 limit. */
  object H3CellIndex extends CellIndex {
    import graft.expr.H3Index
    def res(id: String): Int = H3Index.resolution(H3Index.parse(id))
    def maxRes: Int = 11
    def children(id: String): Seq[String] = {
      val n = H3Index.parse(id)
      H3Index.children(n, H3Index.resolution(n) + 1).map(H3Index.format)
    }
  }

  case class CellState(h3: String, res: Int, status: String, saturated: Boolean,
    lastScannedAt: Option[String], nextDueAt: Option[String],
    resultsLast: Option[Int], attempts: Int)

  case class ScanResult(h3: String, totalResults: Int, maxCategoryCount: Int, asOf: String)

  /** A15 saturation predicate (h3_scheduler.py:256-267). */
  def isSaturated(total: Int, maxCat: Int): Boolean =
    total >= ScanCapPerCell || maxCat >= CategoryCap

  /** Pure transition: scanned cell state + emitted children (if split). */
  def transition(state: CellState, scan: ScanResult,
      idx: CellIndex = CellGridIndex): (CellState, Seq[CellState]) = {
    val saturated = isSaturated(scan.totalResults, scan.maxCategoryCount)
    if (saturated && state.res < idx.maxRes) {
      val children = idx.children(state.h3).map { c =>
        CellState(c, state.res + 1, "pending", saturated = false, None, None, None, 0)
      }
      (state.copy(status = "split", saturated = true,
        lastScannedAt = Some(scan.asOf), resultsLast = Some(scan.totalResults),
        attempts = state.attempts + 1), children)
    } else if (saturated) {
      (state.copy(status = "saturated", saturated = true,
        lastScannedAt = Some(scan.asOf), resultsLast = Some(scan.totalResults),
        attempts = state.attempts + 1), Nil)
    } else {
      (state.copy(status = "scanned", saturated = false,
        lastScannedAt = Some(scan.asOf),
        nextDueAt = Some(plusDays(scan.asOf, RescanDays)),
        resultsLast = Some(scan.totalResults),
        attempts = state.attempts + 1), Nil)
    }
  }

  private def plusDays(ts: String, days: Int): String =
    java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
      .plusDays(days).toString.replace('T', ' ')

  /** Batch step: cells ⋈ scans → updated states ∪ emitted children.
    * Declarative column logic (no UDF) so Catalyst optimizes it, and the
    * identical shape works as a MERGE at scale. */
  def step(cells: DataFrame, scans: DataFrame): DataFrame = {
    val joined = cells.join(scans, Seq("h3"), "left")
    val saturated = col("total_results").isNotNull &&
      (col("total_results") >= ScanCapPerCell || col("max_category_count") >= CategoryCap)
    val splits = saturated && col("res") < CellGrid.MaxRes
    val updated = joined.select(
      col("h3"), col("res"),
      when(col("total_results").isNull, col("status"))
        .when(splits, "split")
        .when(saturated, "saturated")
        .otherwise("scanned").as("status"),
      when(col("total_results").isNull, col("saturated")).otherwise(saturated).as("saturated"),
      when(col("total_results").isNull, col("last_scanned_at"))
        .otherwise(to_timestamp(col("as_of"))).as("last_scanned_at"),
      when(col("total_results").isNull, col("next_due_at"))
        .when(splits || saturated, col("next_due_at"))
        .otherwise(to_timestamp(col("as_of")) + expr(s"INTERVAL $RescanDays DAYS")).as("next_due_at"),
      when(col("total_results").isNull, col("results_last"))
        .otherwise(col("total_results")).as("results_last"),
      when(col("total_results").isNull, col("attempts"))
        .otherwise(col("attempts") + 1).as("attempts"))
    // children of split cells: pure index math via the codegen'd expression
    val children = joined.filter(splits)
      .select(explode(graft.expr.functions.cell_children(col("h3"))).as("h3"),
        (col("res") + 1).as("res"))
      .select(col("h3"), col("res"), lit("pending").as("status"), lit(false).as("saturated"),
        lit(null).cast("timestamp").as("last_scanned_at"),
        lit(null).cast("timestamp").as("next_due_at"),
        lit(null).cast("int").as("results_last"), lit(0).as("attempts"))
    updated.unionByName(children)
  }

  /** P8 — due-cell selection (db.py:180-205): status ≠ split, ordered by
    * (res asc, next_due_at nulls-first), limit. */
  def selectDueCells(cells: DataFrame, asOf: String, limit: Int): DataFrame =
    cells.filter(col("status") =!= "split")
      .filter(col("next_due_at").isNull || col("next_due_at") <= to_timestamp(lit(asOf)))
      .orderBy(col("res").asc, col("next_due_at").asc_nulls_first, col("h3").asc)
      .limit(limit)

  /** Streaming FSM: state per cell key in the state store; scan events drive
    * transitions; outputs updated state + any emitted children rows. */
  def streamingFsm(spark: SparkSession, scans: Dataset[ScanResult],
      idx: CellIndex = CellGridIndex): Dataset[CellState] = {
    import spark.implicits._
    scans.groupByKey(_.h3)
      .flatMapGroupsWithState[CellState, CellState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h3: String, events: Iterator[ScanResult], state: GroupState[CellState]) =>
          val init = state.getOption.getOrElse(
            CellState(h3, idx.res(h3), "pending", saturated = false, None, None, None, 0))
          var cur = init
          val out = scala.collection.mutable.ArrayBuffer[CellState]()
          events.toSeq.sortBy(_.asOf).foreach { ev =>
            val (next, children) = transition(cur, ev, idx)
            cur = next
            out += next
            out ++= children
          }
          state.update(cur)
          out.iterator
      }
  }
}
