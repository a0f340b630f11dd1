package graft.expr

/** Hierarchical spatial cell grid, standing in for H3 (reference:
  * scripts/h3_scheduler.py:30-43,60-78,104-158,419-493).
  *
  * The offline build cannot vendor h3-java (SURVEY §7.5), so the engine keeps
  * the reference's *contract* — resolutions 9..11, a radius table, latlng→cell,
  * cell→center, cell→children, polygon→cells — on a deterministic quad-tree
  * lat/lng grid instead of true hexagons:
  *
  *   - res 9 cell edge ≈ 2×420 m (the reference's res-9 scan radius,
  *     h3_scheduler.py:68-72); each child halves the edge, so effective radii
  *     are 420/210/105 m vs the reference's 420/220/110 — within 5%, and the
  *     adaptive-subdivision semantics (saturation → split into children) are
  *     preserved exactly.
  *   - ids are strings "c{res}:{x}:{y}" — index math only, no geometry state,
  *     so cell ids are stable partition/bucket keys at any scale.
  *
  * All functions are pure and total; callable from codegen via static
  * forwarders like TextAlgo.
  */
object CellGrid {

  /** Degrees per cell edge at res 9: 840 m on a meridian (1° lat ≈ 111320 m). */
  private val res9StepDeg: Double = 2.0 * 420.0 / 111320.0

  val MinRes = 9
  val MaxRes = 11

  /** Scan radius in meters per resolution (reference table, halved per split). */
  def radiusMeters(res: Int): Double = res match {
    case 9  => 420.0
    case 10 => 210.0
    case 11 => 105.0
    case _  => 420.0 * math.pow(2.0, 9 - res)
  }

  def stepDeg(res: Int): Double = res9StepDeg / math.pow(2.0, res - 9)

  def latLngToCell(lat: Double, lng: Double, res: Int): String = {
    val s = stepDeg(res)
    val x = math.floor((lng + 180.0) / s).toLong
    val y = math.floor((lat + 90.0) / s).toLong
    s"c$res:$x:$y"
  }

  /** Parse "c{res}:{x}:{y}"; throws on malformed ids (contract: ids are only
    * produced by this object). */
  def parse(cell: String): (Int, Long, Long) = {
    val body = cell.substring(1)
    val p = body.split(':')
    (p(0).toInt, p(1).toLong, p(2).toLong)
  }

  def cellRes(cell: String): Int = parse(cell)._1

  /** Cell center (reference: h3.cell_to_latlng, h3_scheduler.py:232). */
  def cellToLatLng(cell: String): (Double, Double) = {
    val (res, x, y) = parse(cell)
    val s = stepDeg(res)
    val lat = (y + 0.5) * s - 90.0
    val lng = (x + 0.5) * s - 180.0
    (lat, lng)
  }

  /** Exact 4 children at res+1 (reference: h3.cell_to_children res+1,
    * h3_scheduler.py:419-493; H3 has 7, the quad grid has 4 — the FSM only
    * requires "children cover the parent"). */
  def cellToChildren(cell: String): Array[String] = {
    val (res, x, y) = parse(cell)
    val r = res + 1
    Array(
      s"c$r:${2 * x}:${2 * y}",
      s"c$r:${2 * x + 1}:${2 * y}",
      s"c$r:${2 * x}:${2 * y + 1}",
      s"c$r:${2 * x + 1}:${2 * y + 1}")
  }

  def cellToParent(cell: String): String = {
    val (res, x, y) = parse(cell)
    s"c${res - 1}:${x / 2}:${y / 2}"
  }

  /** Cells at `res` whose center lies inside the polygon (outer ring of
    * (lng,lat) pairs) — h3.polygon_to_cells center-containment semantics
    * (h3_scheduler.py:104-158). Bounded scan over the polygon bbox. */
  def polygonToCells(ring: Array[Array[Double]], res: Int): Array[String] = {
    if (ring.isEmpty) return Array.empty
    val s = stepDeg(res)
    val lngs = ring.map(_(0))
    val lats = ring.map(_(1))
    val x0 = math.floor((lngs.min + 180.0) / s).toLong
    val x1 = math.floor((lngs.max + 180.0) / s).toLong
    val y0 = math.floor((lats.min + 90.0) / s).toLong
    val y1 = math.floor((lats.max + 90.0) / s).toLong
    val out = Array.newBuilder[String]
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) {
        val lat = (y + 0.5) * s - 90.0
        val lng = (x + 0.5) * s - 180.0
        if (TextAlgo.pointInRing(lng, lat, ring)) out += s"c$res:$x:$y"
        y += 1
      }
      x += 1
    }
    out.result()
  }
}
