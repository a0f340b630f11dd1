package graft.domain

import scala.collection.mutable

/** OSM relation → polygon ring assembly (reference:
  * neighbourhoods/extract_neighbourhoods.py:163-296): greedy sequential
  * connection of outer-way segments with 1e-6 endpoint tolerance, reversed
  * attachment when a segment's END meets the ring, explicit closing point,
  * ≥4-point validity. Pure functions — the Spark ETL path wraps them in
  * [[Spatial.assembleRelations]]; RingAssemblySpec holds the property tests
  * (random segmentation/reversal round-trips, orientation, closure).
  */
object RingAssembly {

  val Tolerance = 1e-6

  /** Endpoint equality with tolerance (extract_neighbourhoods.py:163-165). */
  def pointsEqual(a: Array[Double], b: Array[Double]): Boolean =
    math.abs(a(0) - b(0)) < Tolerance && math.abs(a(1) - b(1)) < Tolerance

  /** Assemble way segments into one closed ring, or None
    * (extract_neighbourhoods.py:167-224): start from the first segment,
    * greedily attach the first segment whose start (direct) or end
    * (reversed) meets the current ring end; fail unless every segment is
    * used; close if needed; require ≥4 points. */
  def assembleSingleRing(segments: Seq[Array[Array[Double]]]): Option[Array[Array[Double]]] = {
    if (segments.isEmpty) return None
    val ring = mutable.ArrayBuffer[Array[Double]](segments.head.toIndexedSeq: _*)
    val used = mutable.Set(0)
    var progress = true
    while (used.size < segments.length && progress) {
      progress = false
      val currentEnd = ring.last
      var i = 0
      while (i < segments.length && !progress) {
        if (!used.contains(i)) {
          val seg = segments(i)
          if (pointsEqual(currentEnd, seg.head)) {
            ring ++= seg.iterator.drop(1)
            used += i
            progress = true
          } else if (pointsEqual(currentEnd, seg.last)) {
            ring ++= seg.iterator.take(seg.length - 1).toSeq.reverse
            used += i
            progress = true
          }
        }
        i += 1
      }
    }
    if (used.size != segments.length) None
    else if (ring.length >= 3) {
      if (!pointsEqual(ring.head, ring.last)) ring += ring.head
      if (ring.length >= 4) Some(ring.toArray) else None
    } else None
  }

  /** One OSM relation member: role + way geometry as (lon, lat) pairs. */
  final case class Member(role: String, geometry: Array[Array[Double]])

  /** Relation → outer ring (extract_neighbourhoods.py:249-296): keep members
    * with role outer/"" and non-empty geometry; a single already-closed way
    * passes through; otherwise greedy assembly of the ≥2-point segments. */
  def relationToRing(members: Seq[Member]): Option[Array[Array[Double]]] = {
    val outer = members.filter(m =>
      (m.role == "outer" || m.role == "") && m.geometry.nonEmpty)
    if (outer.isEmpty) return None
    if (outer.length == 1) {
      val coords = outer.head.geometry
      if (coords.length >= 4 && pointsEqual(coords.head, coords.last))
        return Some(coords)
    }
    val segments = outer.map(_.geometry).filter(_.length >= 2)
    if (segments.isEmpty) None else assembleSingleRing(segments)
  }

  /** Signed ring area in degree² (shoelace; >0 = counter-clockwise). Used by
    * the spec to assert orientation-independent assembly. */
  def signedArea(ring: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length - 1) {
      s += ring(i)(0) * ring(i + 1)(1) - ring(i + 1)(0) * ring(i)(1)
      i += 1
    }
    s / 2.0
  }
}
