package graft.expr

/** Hierarchical HEXAGONAL cell grid (reference:
  * scripts/h3_scheduler.py:30-43,60-78,104-158,419-493).
  *
  * The offline build cannot vendor h3-java (SURVEY §7.5), so the engine
  * implements the same index math H3 itself uses on each icosahedron face —
  * an aperture-7 hexagonal lattice with hex cube-rounding — on an azimuthal
  * equidistant plane about the city origin, instead of hallucinating H3's
  * 122-entry base-cell tables:
  *
  *   - cells ARE hexagons; each resolution's lattice is the previous one
  *     scaled by 1/√7 and rotated by atan(√3/5) ≈ 19.1° (H3's Class II/III
  *     skew), with exactly 7 children per cell and an exact
  *     `cellToParent(child) == parent` round-trip for all 7.
  *   - scan radii follow the reference contract verbatim
  *     (h3_scheduler.py:68-72): res 9 → 420 m, 10 → 220 m, 11 → 110 m. The
  *     hex circumradius at each res (420, 420/√7 ≈ 158.7, 60 m) is ≤ the scan
  *     radius, so a scan at the contract radius always covers its whole cell.
  *   - ids are strings "h{res}:{q}:{r}" (axial lattice coords) — pure index
  *     math, no geometry state, so cell ids are stable partition/bucket keys
  *     at any scale.
  *
  * All functions are pure and total; callable from codegen via static
  * forwarders like TextAlgo.
  */
object CellGrid {

  val MinRes = 9
  val MaxRes = 11

  /** Scan radius in meters per resolution — the reference's table verbatim
    * (h3_scheduler.py:68-72). */
  def radiusMeters(res: Int): Double = res match {
    case 9  => 420.0
    case 10 => 220.0
    case 11 => 110.0
    case _  => 420.0 * math.pow(2.0, 9 - res)
  }

  /** Hex circumradius (center→vertex) in meters at `res`: aperture 7 shrinks
    * it by √7 per level from 420 m at res 9. */
  def circumradiusMeters(res: Int): Double =
    BaseSize / math.pow(math.sqrt(7.0), (res - MinRes).toDouble)

  /** Hex cell area in m² at `res` (3√3/2 · circumradius²) — sizes polygon
    * covers for the adaptive-resolution chooser. */
  def hexAreaM2(res: Int): Double = {
    val r = circumradiusMeters(res)
    1.5 * math.sqrt(3.0) * r * r
  }

  // ------------------------------------------------- projection (AEQD)

  private val EarthR = 6371000.0
  /** Projection origin: Paris centroid (city_profiles.py:42-43) — the
    * reference schedules per city; the plane is exact at the origin and
    * city-scale accurate (<0.01% at 20 km). */
  private val OriginLat = 48.8566
  private val OriginLng = 2.3522
  private val phi0 = math.toRadians(OriginLat)
  private val lam0 = math.toRadians(OriginLng)
  private val sinPhi0 = math.sin(phi0)
  private val cosPhi0 = math.cos(phi0)

  /** Azimuthal equidistant forward: (lat, lng) degrees → (x, y) meters. */
  def project(lat: Double, lng: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val dl = math.toRadians(lng) - lam0
    val cosC = math.min(1.0, math.max(-1.0,
      sinPhi0 * math.sin(phi) + cosPhi0 * math.cos(phi) * math.cos(dl)))
    val c = math.acos(cosC)
    val k = if (c < 1e-12) 1.0 else c / math.sin(c)
    val x = EarthR * k * math.cos(phi) * math.sin(dl)
    val y = EarthR * k * (cosPhi0 * math.sin(phi) - sinPhi0 * math.cos(phi) * math.cos(dl))
    (x, y)
  }

  /** Azimuthal equidistant inverse: (x, y) meters → (lat, lng) degrees. */
  def unproject(x: Double, y: Double): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-9) return (OriginLat, OriginLng)
    val c = rho / EarthR
    val sinC = math.sin(c)
    val cosC = math.cos(c)
    val phi = math.asin(math.min(1.0, math.max(-1.0,
      cosC * sinPhi0 + y * sinC * cosPhi0 / rho)))
    val lam = lam0 + math.atan2(x * sinC, rho * cosPhi0 * cosC - y * sinPhi0 * sinC)
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  // ------------------------------------------------- hex lattice math

  private val BaseSize = 420.0 // res-9 circumradius, meters
  private val Sqrt3 = math.sqrt(3.0)

  /** Aperture-7 child transform in axial coords: a_{res+1} = M · a_res.
    * det M = 7; its inverse (/7) maps child coords into parent space. */
  // M = [[3, 1], [-1, 2]]
  private def applyM(q: Double, r: Double): (Double, Double) = (3.0 * q + r, -q + 2.0 * r)
  private def applyMInv(q: Double, r: Double): (Double, Double) =
    ((2.0 * q - r) / 7.0, (q + 3.0 * r) / 7.0)

  /** Real-valued axial coords of projected point at `res` (pointy-top at the
    * base resolution; finer levels pick up the aperture-7 rotation via M). */
  private def axialAt(x: Double, y: Double, res: Int): (Double, Double) = {
    var q = (Sqrt3 / 3.0 * x - y / 3.0) / BaseSize
    var r = (2.0 / 3.0 * y) / BaseSize
    var i = MinRes
    while (i < res) { val t = applyM(q, r); q = t._1; r = t._2; i += 1 }
    (q, r)
  }

  /** Projected center of axial (q, r) at `res`. */
  private def centerXY(q: Long, r: Long, res: Int): (Double, Double) = {
    var qd = q.toDouble
    var rd = r.toDouble
    var i = res
    while (i > MinRes) { val t = applyMInv(qd, rd); qd = t._1; rd = t._2; i -= 1 }
    (BaseSize * (Sqrt3 * qd + Sqrt3 / 2.0 * rd), BaseSize * 1.5 * rd)
  }

  /** Cube-round real axial coords to the containing hex (standard hex
    * rounding — the same operation H3's _hex2dToCoordIJK performs). */
  private def hexRound(q: Double, r: Double): (Long, Long) = {
    val x = q; val z = r; val y = -x - z
    var rx = math.round(x); var ry = math.round(y); var rz = math.round(z)
    val dx = math.abs(rx - x); val dy = math.abs(ry - y); val dz = math.abs(rz - z)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx, rz)
  }

  // ---------------------------------------------------------- public API

  def latLngToCell(lat: Double, lng: Double, res: Int): String = {
    val (x, y) = project(lat, lng)
    val (qf, rf) = axialAt(x, y, res)
    val (q, r) = hexRound(qf, rf)
    s"h$res:$q:$r"
  }

  /** Parse "h{res}:{q}:{r}"; throws on malformed ids (contract: ids are only
    * produced by this object). */
  def parse(cell: String): (Int, Long, Long) = {
    val body = cell.substring(1)
    val p = body.split(':')
    (p(0).toInt, p(1).toLong, p(2).toLong)
  }

  def cellRes(cell: String): Int = parse(cell)._1

  /** Cell center (reference: h3.cell_to_latlng, h3_scheduler.py:232). */
  def cellToLatLng(cell: String): (Double, Double) = {
    val (res, q, r) = parse(cell)
    val (x, y) = centerXY(q, r, res)
    unproject(x, y)
  }

  /** The 7 aperture-7 children at res+1 (reference: h3.cell_to_children
    * res+1, h3_scheduler.py:419-493): the center child M·(q,r) plus its 6
    * neighbors — exactly the finer cells whose hexRound parent is this cell. */
  def cellToChildren(cell: String): Array[String] = {
    val (res, q, r) = parse(cell)
    val rr = res + 1
    val cq = 3 * q + r
    val cr = -q + 2 * r
    Array(
      s"h$rr:$cq:$cr",
      s"h$rr:${cq + 1}:$cr",
      s"h$rr:$cq:${cr + 1}",
      s"h$rr:${cq - 1}:$cr",
      s"h$rr:$cq:${cr - 1}",
      s"h$rr:${cq + 1}:${cr - 1}",
      s"h$rr:${cq - 1}:${cr + 1}")
  }

  def cellToParent(cell: String): String = {
    val (res, q, r) = parse(cell)
    val (pq, pr) = hexRound((2.0 * q - r) / 7.0, (q + 3.0 * r) / 7.0)
    s"h${res - 1}:$pq:$pr"
  }

  /** The 6 same-res neighbors (h3.grid_disk k=1 minus center). */
  def neighbors(cell: String): Array[String] = {
    val (res, q, r) = parse(cell)
    Array(
      s"h$res:${q + 1}:$r", s"h$res:$q:${r + 1}", s"h$res:${q - 1}:$r",
      s"h$res:$q:${r - 1}", s"h$res:${q + 1}:${r - 1}", s"h$res:${q - 1}:${r + 1}")
  }

  /** Axial bounding range of a set of projected points at `res`, padded by
    * `margin` cells (the AEQD plane is near-affine at city scale; the margin
    * absorbs hex rounding + residual curvature). */
  private def axialBounds(pts: Iterator[(Double, Double)], res: Int,
      margin: Long): (Long, Long, Long, Long) = {
    var qMin = Double.MaxValue; var qMax = Double.MinValue
    var rMin = Double.MaxValue; var rMax = Double.MinValue
    pts.foreach { case (x, y) =>
      val (q, r) = axialAt(x, y, res)
      if (q < qMin) qMin = q; if (q > qMax) qMax = q
      if (r < rMin) rMin = r; if (r > rMax) rMax = r
    }
    (math.floor(qMin).toLong - margin, math.ceil(qMax).toLong + margin,
      math.floor(rMin).toLong - margin, math.ceil(rMax).toLong + margin)
  }

  /** Cells at `res` whose CENTER lies inside the polygon (outer ring of
    * (lng,lat) pairs) — h3.polygon_to_cells center-containment semantics
    * (h3_scheduler.py:104-158).
    *
    * Scanline fill over the ring's axial bbox: cell centers along one axial
    * column are collinear in the projected plane (centerXY is linear in
    * (q, r)), so each column intersects the ring ONCE — O(columns · vertices
    * + cells) instead of the old per-cell ray-cast's O(cells · vertices),
    * which is what makes finer covers affordable (res 12 over the 98 Paris
    * rings: ~6k point-in-ring tests per large polygon → ~80 line-ring
    * intersections). Crossing parity equals the per-center ray-cast for any
    * center off the boundary; a center within float-epsilon of the boundary
    * sits in a boundary-crossed cell, which the cover's band includes (and
    * de-flags) regardless — see [[polygonCoverFlagged]]'s soundness note. */
  def polygonToCells(ring: Array[Array[Double]], res: Int): Array[String] = {
    if (ring.isEmpty) return Array.empty
    val proj = ring.map(p => project(p(1), p(0)))
    val (q0, q1, r0, r1) = axialBounds(proj.iterator, res, margin = 2L)
    // centerXY is linear with zero offset: center(q, r) = q·U + r·W
    val (ux, uy) = centerXY(1L, 0L, res)
    val (wx, wy) = centerXY(0L, 1L, res)
    val out = Array.newBuilder[String]
    val crossings = new Array[Double](math.max(1, proj.length))
    var q = q0
    while (q <= q1) {
      // column line: L(t) = (q·ux + t·wx, q·uy + t·wy); centers at integer t
      val ax = q * ux; val ay = q * uy
      var nc = 0
      var i = 0
      while (i < proj.length - 1) {
        val (e0x, e0y) = proj(i)
        val (e1x, e1y) = proj(i + 1)
        // side of each endpoint relative to the column line (cross with W)
        val s0 = (e0x - ax) * wy - (e0y - ay) * wx
        val s1 = (e1x - ax) * wy - (e1y - ay) * wx
        if ((s0 > 0.0) != (s1 > 0.0)) {
          val dx = e1x - e0x; val dy = e1y - e0y
          val denom = wx * dy - wy * dx
          if (denom != 0.0) {
            crossings(nc) = ((e0x - ax) * dy - (e0y - ay) * dx) / denom
            nc += 1
          }
        }
        i += 1
      }
      java.util.Arrays.sort(crossings, 0, nc)
      // center (q, r) is inside iff the crossing count beyond t = r is odd
      // (a +t ray; identical parity convention to a per-center ray-cast)
      var ci = 0
      var r = r0
      while (r <= r1) {
        while (ci < nc && crossings(ci) <= r.toDouble) ci += 1
        if (((nc - ci) & 1) == 1) out += s"h$res:$q:$r"
        r += 1
      }
      q += 1
    }
    out.result()
  }

  /** TRUE polygon cover: center-contained cells + a boundary band — still a
    * SUPERSET of every cell intersecting the polygon (any point inside the
    * polygon maps to a cell in this set), but far tighter than [[bboxCover]]
    * for elongated/diagonal zones, so the spatial-join prefilter admits fewer
    * candidate pairs.
    *
    * Correctness: a cell intersecting the polygon is either entirely inside
    * (center inside → in [[polygonToCells]]) or crossed by the boundary. The
    * boundary is sampled at ≤ half the circumradius, well under the hex
    * inradius (√3/2 · circumradius), so every boundary-crossed cell is the
    * cell of some sample or one of its 6 neighbors — both included. */
  def polygonCover(ring: Array[Array[Double]], res: Int): Array[String] =
    polygonCoverFlagged(ring, res).map(_._1)

  /** [[polygonCover]] with a per-cell INTERIOR flag: `true` iff the cell is
    * provably entirely inside the polygon — center-contained AND not in the
    * boundary band. By the band's own sampling invariant (every
    * boundary-crossed cell is some sample's cell or one of its 6 neighbors,
    * documented on [[polygonCover]]), a cell outside the band is either
    * entirely inside or entirely outside; center-contained picks the former.
    * A point in an interior cell is therefore contained WITHOUT a ray-cast —
    * the skip that removes the O(ring-vertices) exact test for the bulk of a
    * polygon's area (only the thin boundary band still ray-casts).
    * Emission order matches the old cover exactly: center cells first, then
    * band-only cells in walk order. */
  def polygonCoverFlagged(ring: Array[Array[Double]], res: Int): Array[(String, Boolean)] = {
    if (ring.isEmpty) return Array.empty
    val band = scala.collection.mutable.LinkedHashSet[String]()
    val step = circumradiusMeters(res) * 0.5
    var i = 0
    while (i < ring.length - 1) {
      val (x0, y0) = project(ring(i)(1), ring(i)(0))
      val (x1, y1) = project(ring(i + 1)(1), ring(i + 1)(0))
      val n = math.max(1L, math.ceil(math.hypot(x1 - x0, y1 - y0) / step).toLong)
      var k = 0L
      while (k <= n) {
        val t = k.toDouble / n
        val (lat, lng) = unproject(x0 + (x1 - x0) * t, y0 + (y1 - y0) * t)
        val c = latLngToCell(lat, lng, res)
        band += c
        neighbors(c).foreach(band += _)
        k += 1
      }
      i += 1
    }
    val center = polygonToCells(ring, res)
    val centerSet = center.toSet
    val out = Array.newBuilder[(String, Boolean)]
    center.foreach(c => out += ((c, !band.contains(c))))
    band.foreach(c => if (!centerSet.contains(c)) out += ((c, false)))
    out.result()
  }

  /** SUPERSET of the cells at `res` that intersect the lat/lng bbox — the
    * spatial-join prefilter cover (every point in the bbox maps to a cell in
    * this set). Enumerates the axial range of the bbox corners + edge
    * midpoints with a 2-cell margin. */
  def bboxCover(latMin: Double, latMax: Double, lngMin: Double, lngMax: Double,
      res: Int): Array[String] = {
    val latMid = (latMin + latMax) / 2.0
    val lngMid = (lngMin + lngMax) / 2.0
    val pts = Iterator(
      (latMin, lngMin), (latMin, lngMax), (latMax, lngMin), (latMax, lngMax),
      (latMid, lngMin), (latMid, lngMax), (latMin, lngMid), (latMax, lngMid))
      .map { case (la, lo) => project(la, lo) }
    val (q0, q1, r0, r1) = axialBounds(pts, res, margin = 2L)
    val out = Array.newBuilder[String]
    var q = q0
    while (q <= q1) {
      var r = r0
      while (r <= r1) { out += s"h$res:$q:$r"; r += 1 }
      q += 1
    }
    out.result()
  }
}
