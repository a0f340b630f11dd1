package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.expr.H3Index
import graft.ops.H3Native

/** Pins the native H3 bit algebra to the PUBLISHED worked examples from the
  * H3 documentation (the only offline ground truth available), then checks
  * the algebraic laws on generated ids, then cross-checks the SQL pipeline
  * against the pure-Scala implementation. */
class H3IndexSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  // ---- published ground truth (H3 docs: cellToParent / cellToChildren
  // worked example over downtown San Francisco)

  test("doc pin: fields of 8928308280fffff") {
    val n = H3Index.parse("8928308280fffff")
    assert(H3Index.mode(n) == 1)
    assert(H3Index.resolution(n) == 9)
    assert(H3Index.isValidCell(n))
    assert(!H3Index.isPentagon(n))
    assert(H3Index.format(n) == "8928308280fffff")
  }

  test("doc pin: parent of 8928308280fffff at res 8 is 8828308281fffff") {
    val n = H3Index.parse("8928308280fffff")
    assert(H3Index.format(H3Index.parent(n, 8)) == "8828308281fffff")
  }

  test("doc pin: children of 8828308281fffff at res 9 are the published seven") {
    val kids = H3Index.children(H3Index.parse("8828308281fffff"), 9)
      .map(H3Index.format).toSet
    assert(kids == Set(
      "89283082803ffff", "89283082807ffff", "8928308280bffff",
      "8928308280fffff", "89283082813ffff", "89283082817ffff",
      "8928308281bffff"))
  }

  // ---- algebraic laws on generated valid ids

  private val genCell: Gen[Long] = for {
    res <- Gen.choose(0, 15)
    base <- Gen.choose(0, H3Index.NumBaseCells - 1)
    digits <- Gen.listOfN(res, Gen.choose(0, 6))
  } yield {
    val withDigits = digits.zipWithIndex.foldLeft(
      (1L << 59) | (res.toLong << 52) | (base.toLong << 45) |
        ((1L << (3 * (15 - res))) - 1)) { case (acc, (d, i)) =>
      (acc & ~(0x7L << (45 - 3 * (i + 1)))) | (d.toLong << (45 - 3 * (i + 1)))
    }
    withDigits
  }

  test("law: parse/format round-trip and parent-of-child identity") {
    PropDrive.forAll(genCell.filter(H3Index.isValidCell), 300) { n =>
      {
        assert(H3Index.parse(H3Index.format(n)) == n)
        val r = H3Index.resolution(n)
        if (r < 15) {
          val kids = H3Index.children(n, r + 1)
          assert(kids.size == (if (H3Index.isPentagon(n)) 6 else 7))
          kids.foreach { k =>
            assert(H3Index.isValidCell(k), s"invalid child ${H3Index.format(k)}")
            assert(H3Index.parent(k, r) == n)
          }
          assert(H3Index.centerChild(n, r + 1) == kids.head)
        }
        if (r > 0) {
          val p = H3Index.parent(n, r - 1)
          assert(H3Index.isValidCell(p) || !H3Index.isValidCell(n))
          assert(H3Index.children(p, r).contains(n) || !H3Index.isValidCell(n))
        }
      }
    }
  }

  test("law: two-level children count is 49 for hexagons, 41 under a pentagon") {
    val hexN = H3Index.parse("8928308280fffff")
    assert(H3Index.children(hexN, 11).size == 49)
    val pent = (1L << 59) | (9L << 52) | (4L << 45) | ((1L << 18) - 1)
    assert(H3Index.isPentagon(pent))
    // pentagon → 6 at the next level; its center child is again a pentagon
    // (6 children), the other 5 are hexagons (7 each): 6 + 5*7 = 41
    assert(H3Index.children(pent, 11).size == 41)
  }

  // ---- SQL pipeline (both declared queries) vs the pure-Scala mirror

  test("sql cross-check: h3_native_ops agrees with H3Index on every fixture id") {
    val rows = H3Native.qH3NativeOps(spark, "").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == H3Native.fixtureIds.toSet)
    H3Native.fixtureIds.foreach { id =>
      val n = H3Index.parse(id)
      val row = rows(id)
      assert(row.getBoolean(1) == H3Index.isValidCell(n), s"is_valid($id)")
      if (H3Index.isValidCell(n)) {
        assert(row.getLong(2) == H3Index.resolution(n), s"res($id)")
        assert(row.getLong(3) == H3Index.baseCell(n), s"base($id)")
        assert(row.getBoolean(4) == H3Index.isPentagon(n), s"pent($id)")
        assert(row.getString(5) ==
          H3Index.format(H3Index.parent(n, H3Index.resolution(n) - 1)),
          s"parent($id)")
      } else assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(5))
    }
  }

  test("sql cross-check: parent rollup groups every cell under its H3Index res-9 ancestor") {
    val rows = H3Native.qH3ParentRollup(spark, "").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = H3Native.rollupState
      .filter { case (id, _) => H3Index.resolution(H3Index.parse(id)) >= H3Native.RollupRes }
      .groupBy { case (id, _) =>
        H3Index.format(H3Index.parent(H3Index.parse(id), H3Native.RollupRes)) }
      .map { case (p, cells) =>
        p -> ((cells.size.toLong, cells.map(_._2.toLong).sum)) }
    assert(rows == expect)
  }

  test("sql cross-check: subdivision emits exactly the H3Index children") {
    val out = H3Native.qH3SubdivideSaturated(spark, "").collect()
      .groupBy(_.getString(0))
    H3Native.schedulerState.foreach { case (id, results) =>
      val n = H3Index.parse(id)
      val r = H3Index.resolution(n)
      val rows = out(id)
      if (results >= H3Native.ScanCap && r < H3Native.MaxSchedRes) {
        val expect = H3Index.children(n, r + 1).map(H3Index.format).toSet
        assert(rows.map(_.getString(2)).toSet == expect, s"children($id)")
        assert(rows.forall(row => row.getString(1) == "split" && row.getLong(3) == r + 1))
      } else {
        assert(rows.length == 1 && rows.head.getString(1) == "keep" &&
          rows.head.getString(2) == id && rows.head.getLong(3) == r)
      }
    }
  }
}
