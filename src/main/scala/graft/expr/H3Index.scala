package graft.expr

/** Native H3 INDEX math — the spec-derivable half of real-H3 interop
  * (VERDICT r13 item 2), replacing "treat the id as an opaque string" for
  * every hierarchy operation the reference performs on its scheduler keys:
  * `h3.get_resolution` (h3_scheduler.py:233), `h3.cell_to_children`
  * (h3_scheduler.py:433), validity screening, and parent re-keying.
  *
  * The H3 cell index is a public 64-bit layout (Uber H3, Apache-2):
  *
  * {{{
  *   bit 63      reserved (0)
  *   bits 59-62  mode (1 = cell)
  *   bits 56-58  reserved (0)
  *   bits 52-55  resolution 0-15
  *   bits 45-51  base cell 0-121
  *   bits 0-44   15 aperture-7 digits, 3 bits each; digit for res r sits at
  *               bits (45-3r)..(47-3r); digits finer than the cell's
  *               resolution are 7 (unused marker)
  * }}}
  *
  * Everything here is pure bit algebra on that layout — parse, validity,
  * parent (coarsen = blank fine digits to 7), children (refine = enumerate
  * digits 0-6, minus the deleted subsequence under pentagons). It is
  * verified against the published worked examples in the H3 documentation
  * (the 8928308280fffff parent/children family) in H3IndexSpec.
  *
  * What is deliberately NOT here: `cell_to_latlng`. Projecting an id to a
  * point requires the 122-entry base-cell FaceIJK table and the 20
  * icosahedron face-center constants — published DATA (baseCells.c /
  * faceijk.c in the H3 sources), not derivable math, and this build runs
  * with zero egress. Fabricating those tables would produce real-looking
  * but wrong geometry, so the geometry boundary stays as documented in
  * [[graft.ops.CellInterop]]: positions come from a representative point.
  * The boundary is now NARROW — only latlng derivation needs the point;
  * validity, hierarchy walks, and cell-keyed joins run natively on H3 ids.
  */
object H3Index {

  val ModeCell = 1
  val NumBaseCells = 122
  val MaxRes = 15

  /** The 12 base cells centered on icosahedron vertices (H3 docs list them;
    * every resolution has exactly these 12 pentagon lineages). Used only to
    * enforce the deleted-subsequence rule; fixture cells are hexagons. */
  val PentagonBaseCells: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  def parse(hex: String): Long = java.lang.Long.parseUnsignedLong(hex, 16)

  /** Canonical 15-hex-char form (H3's string rendering). */
  def format(n: Long): String = f"$n%015x"

  def mode(n: Long): Int = ((n >>> 59) & 0xF).toInt
  def resolution(n: Long): Int = ((n >>> 52) & 0xF).toInt
  def baseCell(n: Long): Int = ((n >>> 45) & 0x7F).toInt

  /** Aperture-7 digit for resolution step r (1-based). */
  def digit(n: Long, r: Int): Int = ((n >>> (45 - 3 * r)) & 0x7).toInt

  /** A pentagon CELL is the centermost descendant of a pentagon base cell:
    * every digit along its path is 0. */
  def isPentagon(n: Long): Boolean =
    PentagonBaseCells(baseCell(n)) &&
      (1 to resolution(n)).forall(digit(n, _) == 0)

  def isValidCell(n: Long): Boolean = {
    val r = resolution(n)
    (n >>> 63) == 0 && mode(n) == ModeCell && ((n >>> 56) & 0x7) == 0 &&
      baseCell(n) < NumBaseCells &&
      (1 to r).forall(i => digit(n, i) <= 6) &&
      ((r + 1) to MaxRes).forall(i => digit(n, i) == 7) &&
      // pentagon deleted subsequence: under a pentagon base cell the FIRST
      // non-zero digit may not be 1 (that child is the deleted one)
      (!PentagonBaseCells(baseCell(n)) ||
        (1 to r).find(i => digit(n, i) != 0).forall(i => digit(n, i) != 1))
  }

  /** Coarsen to `pres`: blank the finer digits to 7, rewrite the res field.
    * Verified: parent(0x8928308280fffff, 8) == 0x8828308281fffff (the H3
    * docs' worked example). */
  def parent(n: Long, pres: Int): Long = {
    require(pres >= 0 && pres <= resolution(n),
      s"parent res $pres above cell res ${resolution(n)}")
    ((n | ((1L << (3 * (MaxRes - pres))) - 1)) & ~(0xFL << 52)) | (pres.toLong << 52)
  }

  /** Centermost descendant at `cres`: extend the path with digit 0. */
  def centerChild(n: Long, cres: Int): Long = {
    val r = resolution(n)
    require(cres >= r && cres <= MaxRes, s"child res $cres below cell res $r")
    val cleared = (1 to cres).foldLeft((n & ~(0xFL << 52)) | (cres.toLong << 52)) {
      (acc, i) => if (i <= r) acc else acc & ~(0x7L << (45 - 3 * i))
    }
    cleared
  }

  /** Aperture-7 subdivision to `cres` (h3.cell_to_children): the 7^(cres-r)
    * descendants — pentagons fan out to 6 at their own level (digit 1 is the
    * deleted subsequence) and their center child remains a pentagon. */
  def children(n: Long, cres: Int): Seq[Long] = {
    val r = resolution(n)
    require(cres >= r && cres <= MaxRes, s"child res $cres below cell res $r")
    if (cres == r) Seq(n)
    else {
      val withRes = (n & ~(0xFL << 52)) | ((r + 1).toLong << 52)
      val shift = 45 - 3 * (r + 1)
      val digits = if (isPentagon(n)) Seq(0, 2, 3, 4, 5, 6) else (0 to 6)
      digits.flatMap { d =>
        val child = (withRes & ~(0x7L << shift)) | (d.toLong << shift)
        children(child, cres)
      }
    }
  }
}
