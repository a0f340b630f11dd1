package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{CellGrid, TextAlgo}

class CellGridSpec extends AnyFunSuite {

  private val parisLat = 48.8566
  private val parisLng = 2.3522

  test("roundtrip: cell center is within cell radius of original point") {
    for (res <- 9 to 11) {
      val cell = CellGrid.latLngToCell(parisLat, parisLng, res)
      val (clat, clng) = CellGrid.cellToLatLng(cell)
      val d = TextAlgo.haversineMeters(parisLat, parisLng, clat, clng)
      // center of the containing cell is at most edge·√2/2 away; edge = 2·radius
      assert(d <= CellGrid.radiusMeters(res) * 2 * math.sqrt(2) / 2 + 1)
      assert(CellGrid.cellRes(cell) == res)
    }
  }

  test("children: exactly 4, all inside parent, parent roundtrip") {
    val cell = CellGrid.latLngToCell(parisLat, parisLng, 9)
    val kids = CellGrid.cellToChildren(cell)
    assert(kids.length == 4)
    kids.foreach { k =>
      assert(CellGrid.cellRes(k) == 10)
      assert(CellGrid.cellToParent(k) == cell)
      val (klat, klng) = CellGrid.cellToLatLng(k)
      assert(CellGrid.latLngToCell(klat, klng, 9) == cell)
    }
  }

  test("determinism: same input → same cell id") {
    assert(CellGrid.latLngToCell(parisLat, parisLng, 9)
      == CellGrid.latLngToCell(parisLat, parisLng, 9))
  }

  test("polygonToCells covers a city-bbox-sized polygon") {
    // ~Paris bbox as a ring of (lng, lat)
    val ring = Array(
      Array(2.224, 48.815), Array(2.470, 48.815),
      Array(2.470, 48.902), Array(2.224, 48.902), Array(2.224, 48.815))
    val cells = CellGrid.polygonToCells(ring, 9)
    // ~18km x ~9.7km area with 840m cells → expect on the order of 20x11 cells
    assert(cells.nonEmpty && cells.length > 100 && cells.length < 600)
    assert(cells.distinct.length == cells.length)
    // every returned cell center is inside the ring
    cells.foreach { c =>
      val (lat, lng) = CellGrid.cellToLatLng(c)
      assert(TextAlgo.pointInRing(lng, lat, ring))
    }
    // res 10 refines: roughly 4x the cells
    val cells10 = CellGrid.polygonToCells(ring, 10)
    assert(cells10.length > 3 * cells.length && cells10.length < 5 * cells.length)
  }
}
