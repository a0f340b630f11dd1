package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interop boundary between EXTERNAL H3-keyed data and the engine's
  * [[graft.expr.CellGrid]] keys.
  *
  * The reference keys its scheduler state by real H3 ids
  * (`ingestion_cell_h3.h3`, h3_scheduler.py:97,140-151). CellGrid honors the
  * same radius contract per resolution (420/220/110 m, h3_scheduler.py:68-72)
  * but its `h{res}:{q}:{r}` ids are a different index space. Since
  * [[graft.expr.H3Index]]/[[H3Native]], every HIERARCHY operation runs
  * natively on the H3 ids themselves — validity, resolution, parent
  * re-keying, aperture-7 subdivision, and H3-keyed equi-joins need no
  * translation at all. The remaining boundary is GEOMETRY: projecting an id
  * to a lat/lng requires the H3 base-cell/face constant tables (published
  * data, unavailable offline — see H3Index's Scaladoc), so any operation
  * that needs a position re-keys from a representative point (the cell
  * center every H3 export can emit via `h3.cell_to_latlng`, or the
  * underlying entity's own lat/lng). Resolutions map 1:1 (both grids follow
  * the reference's res 9→11 ladder).
  *
  * Scale: re-keying is pure per-row index math (codegen'd `cell_of`) — no
  * join, no shuffle; the output column is immediately usable as the
  * partition/bucket key for cell-equi-joins against engine-keyed data.
  */
object CellInterop {

  /** Re-key externally H3-keyed rows into CellGrid ids from their
    * representative point. Keeps the original id column (commonly `h3`)
    * untouched for lineage; adds `cellCol` with the engine key. */
  def rekeyFromPoint(df: DataFrame, latCol: Column, lngCol: Column, resCol: Column,
      cellCol: String = "cell"): DataFrame =
    df.withColumn(cellCol, graft.expr.functions.cell_of(latCol, lngCol, resCol.cast("int")))

  /** Same, keying at a fixed target resolution so re-keyed data can join
    * state kept at a coarser level. The key is derived from the POINT at
    * `targetRes` (point-accurate), not by parent-walking the fine cell —
    * for points near cell boundaries the two can disagree (hex hierarchies
    * don't perfectly nest), which is exactly why re-derivation from the
    * point is the supported interop path. */
  def rekeyToRes(df: DataFrame, latCol: Column, lngCol: Column, targetRes: Int,
      cellCol: String = "cell"): DataFrame =
    df.withColumn(cellCol, graft.expr.functions.cell_of(latCol, lngCol, lit(targetRes)))
}
