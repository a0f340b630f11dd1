package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Pure float-vector kernels, callable as static methods from whole-stage
  * codegen (same pattern as [[TextAlgo]]). These replace the higher-order
  * function (`zip_with`/`aggregate`) formulations, which Spark evaluates
  * INTERPRETED — measured 10–100× slower on the ANN/dedup hot paths at sf0.1.
  *
  * Numeric contract: accumulation is sequential in element order, in double,
  * exactly like the left-to-right `aggregate()` fold it replaces — results are
  * bit-identical, so the DuckDB oracle parity (6-dp rounding vs
  * `list_cosine_similarity`) is unchanged.
  */
object VecAlgo {

  /** Ray-cast point-in-ring directly over Catalyst ArrayData (same algorithm
    * as [[TextAlgo.pointInRing]] without materializing Scala arrays). */
  def pointInRing(lng: Double, lat: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.getArray(i)
      val pj = ring.getArray(j)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      if (((yi > lat) != (yj > lat)) &&
          (lng < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** UTF8String bridges for the hex grid (codegen calls these). */
  def latLngCell(lat: Double, lng: Double, res: Int): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(CellGrid.latLngToCell(lat, lng, res))

  def cellChildrenData(cell: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(CellGrid.cellToChildren(cell.toString)
      .map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))

  /** ASCII character-set bitmasks (codepoints 0–63 → [0], 64–127 → [1]) in
    * one pass — replaces the interpreted aggregate/transform HOF chain.
    * Same semantics as OR-ing `ascii(c)` over split characters: codepoints
    * ≥128 are ignored. */
  def asciiMasks(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    var lo = 0L
    var hi = 0L
    val s = text.toString
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 64) lo |= 1L << cp
      else if (cp < 128) hi |= 1L << (cp - 64)
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(lo, hi))
  }

  /** MinHash parameters — must stay in sync with TextDedup (8 bands × 4). */
  val MinHashP = 2147483647L
  val NumMinHashes = 32
  /** Permutation constants — public so the DuckDB oracle inlines the same
    * values ([[graft.ops.TextDedup]] minhashLshSql). */
  val mhA: Array[Long] = Array.tabulate(NumMinHashes)(i => 1103515245L * (i + 1) % MinHashP)
  val mhB: Array[Long] = Array.tabulate(NumMinHashes)(i => (12345L + 2654435761L * i) % MinHashP)

  /** All 32 MinHash signature values of a document in ONE pass over its
    * shingle set — replaces the explode + 32-min-aggregate shuffle. The
    * shingle base hash is the oracle-replayable polynomial hash
    * ([[TextAlgo.polyHash]] base 31), so DuckDB can replay the ENTIRE
    * signature → band → candidate-pair pipeline (graduating dd_minhash_lsh
    * from a rows-only check to a full hash oracle); EMPTY array when the
    * document has no shingles (mirrors the aggregated form, where such docs
    * produce no row — callers filter on size; an empty array keeps codegen
    * null-free). */
  def minHashSigs(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val shingles = TextAlgo.wordShingles(text.toString)
    if (shingles.isEmpty) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(NumMinHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = TextAlgo.polyHash(shingles(i), 31L)
      var k = 0
      while (k < NumMinHashes) {
        val v = (mhA(k) * h + mhB(k)) % MinHashP
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 62-bit SimHash of whitespace-tokenized text in ONE pass — replaces the
    * explode + per-bit conditional-sum aggregation (a full shuffle per
    * corpus). Each token is hashed by TWO oracle-replayable polynomial
    * hashes ([[TextAlgo.polyHash]] bases 31 and 131, 31 bits each): bits
    * 0–30 of the simhash vote on h1's bits, bits 31–61 on h2's — which is
    * what lets DuckDB replay the full simhash → band → hamming pipeline as a
    * hash oracle (formerly xxhash64-based and rows-only). `"".split` yields
    * a single empty token exactly like `split(trim(text), '\\s+')`
    * (VecAlgoSpec pins the definition against an independent fold). */
  def simHash62(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val words = TextAlgo.simHashTokens(text.toString)
    val votes = new Array[Int](62)
    var i = 0
    while (i < words.length) {
      // packed h31 | (h131 << 31): ONE codepoint walk per token, and the
      // packed bit layout IS the vote layout (bits 0-30 h31, 31-61 h131)
      val h = TextAlgo.polyHash2(words(i))
      var bit = 0
      while (bit < 62) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sim = 0L
    var bit = 0
    while (bit < 62) {
      if (votes(bit) > 0) sim |= 1L << bit
      bit += 1
    }
    sim
  }

  /** ArrayData bridge for [[TextAlgo.repetitionCounts]] (codegen calls this). */
  def repetitionCountsData(text: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(TextAlgo.repetitionCounts(text.toString))

  /** ArrayData bridge for [[TextAlgo.wordNgrams]] (codegen calls this). */
  def wordNgramData(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData =
    new GenericArrayData(TextAlgo.wordNgrams(if (text == null) null else text.toString, n)
      .map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))

  /** ArrayData bridge for [[TextAlgo.wordShingles]] (codegen calls this). */
  def wordShingleData(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val sh = TextAlgo.wordShingles(if (text == null) null else text.toString)
    new GenericArrayData(sh.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
  }

  /** Cosine similarity of two float vectors, accumulated in double.
    * Mirrors aggregate(zip_with(...)) semantics: pairs beyond the shorter
    * length contribute nothing to the dot product, each norm runs over its
    * own full vector. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val v = a.getFloat(i).toDouble; sa += v * v; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val v = b.getFloat(i).toDouble; sb += v * v; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  private def containsUtf8(arr: ArrayData, s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (s.equals(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  /** P7 tag-criteria predicate + match-score in ONE pass over the tag array
    * (replaces three interpreted HOF lambdas per (poi × template) row —
    * `exists`×2 + `aggregate(filter(...))`). Returns the sum of matching
    * required-tag confidences, or null when the row is ineligible (no
    * required match at `minConf`, or any excluded match at `minConf`).
    * Accumulation is in tag-array order, like the left-to-right `aggregate`
    * fold it replaces — bit-identical scores. */
  def tagMatchScore(tags: ArrayData, req: ArrayData, exc: ArrayData,
      minConf: Double): java.lang.Double = {
    var score = 0.0
    var matched = false
    val n = tags.numElements()
    var i = 0
    while (i < n) {
      val t = tags.getStruct(i, 2)
      val conf = t.getDouble(1)
      if (conf >= minConf) {
        val tag = t.getUTF8String(0)
        if (containsUtf8(exc, tag)) return null
        if (containsUtf8(req, tag)) { matched = true; score += conf }
      }
      i += 1
    }
    if (matched) java.lang.Double.valueOf(score) else null
  }

  /** Cosine similarity of a float vector (embedding) against a double vector
    * (k-means centroids are exact-quantized means, carried in double) — same
    * sequential-in-double accumulation contract as [[cosine]]. */
  def cosineFD(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val v = a.getFloat(i).toDouble; sa += v * v; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val v = b.getDouble(i); sb += v * v; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  /** Spark's `round(col, 6)` semantics for doubles (BigDecimal HALF_UP) —
    * [[nearestCells]] must rank by the SAME rounded similarity as the
    * `round(cosineFD, 6)` dataflow it replaces, or oracle parity breaks. */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-k nearest centroids of one float vector against a flattened
    * `numCells × dim` double centroid matrix, in ONE codegen'd pass — the
    * k-means/IVF assignment step without a crossJoin or a window: ranked by
    * (6-dp-rounded cosine DESC, cell ASC), exactly the ordering the
    * crossJoin + row_number dataflow produced. Per-element math is
    * [[cosineFD]]'s sequential-in-double accumulation, so similarities are
    * bit-identical. Returns array<struct<cell_id: long, sim: double>>. */
  def nearestCells(v: ArrayData, flat: ArrayData, numCells: Int, k: Int): ArrayData = {
    val dim = flat.numElements() / numCells
    val nv = v.numElements()
    val vd = new Array[Double](nv)
    var i = 0
    while (i < nv) { vd(i) = v.getFloat(i).toDouble; i += 1 }
    var sa = 0.0
    i = 0
    while (i < nv) { sa += vd(i) * vd(i); i += 1 }
    val sims = new Array[Double](numCells)
    var c = 0
    while (c < numCells) {
      val off = c * dim
      val n = math.min(nv, dim)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vd(j) * flat.getDouble(off + j); j += 1 }
      var sb = 0.0
      j = 0
      while (j < dim) { val x = flat.getDouble(off + j); sb += x * x; j += 1 }
      sims(c) = round6(dot / (math.sqrt(sa) * math.sqrt(sb)))
      c += 1
    }
    val kk = math.min(k, numCells)
    val out = new Array[Any](kk)
    val used = new Array[Boolean](numCells)
    var r = 0
    while (r < kk) {
      var best = -1
      var c2 = 0
      while (c2 < numCells) {
        if (!used(c2) && (best == -1 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](best.toLong, sims(best)))
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization code assignment of one float vector against a
    * LITERAL flattened codebook tensor (`numSub × numCodes × subDim` doubles
    * — the ~8 KB PQ model, shipped with the plan like [[nearestCells]]'
    * centroid matrix): per subspace the argmin cell by 6-dp-ROUNDED squared
    * L2, cell-ascending tie-break — exactly the deterministic contract of
    * the join-expanded assignment it replaces (round(Σ(v-cv)², 6) per
    * (vec, sub, cell), then lexicographic (d2, cell) min), so codes are
    * identical and the DuckDB replay of train→encode→ADC is unchanged.
    * Returns array<int> of length numSub. */
  def pqCells(v: ArrayData, flat: ArrayData, numSub: Int, numCodes: Int): ArrayData = {
    val subDim = flat.numElements() / (numSub * numCodes)
    val out = new Array[Int](numSub)
    var sub = 0
    while (sub < numSub) {
      var bestCell = 0
      var bestD2 = Double.PositiveInfinity
      var cell = 0
      while (cell < numCodes) {
        val off = (sub * numCodes + cell) * subDim
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v.getFloat(sub * subDim + d).toDouble - flat.getDouble(off + d)
          d2 += diff * diff
          d += 1
        }
        val r = round6(d2)
        if (r < bestD2) { bestD2 = r; bestCell = cell }
        cell += 1
      }
      out(sub) = bestCell
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** Per-vector PQ training contribution: one codegen'd pass computing the
    * [[pqCells]] assignment AND flattening the vector into its 64 per-
    * component rows `struct<sub, cell, dim, qv>` (qv = the 1e6-quantized
    * component, the exact-integer mean contract). Built for
    * `posexplode(pq_contrib(...))`: a generator INPUT is evaluated once per
    * child row, which is what keeps the assignment from re-running per
    * exploded row (a bare `select(pq_cells(...), posexplode(...))` collapses
    * into a Project ABOVE the Generate — 64 assignment evaluations per
    * vector). */
  def pqContrib(v: ArrayData, flat: ArrayData, numSub: Int, numCodes: Int,
      quantScale: Double): ArrayData = {
    val cells = pqCells(v, flat, numSub, numCodes)
    val n = v.numElements()
    val subDim = n / numSub
    val out = new Array[Any](n)
    var g = 0
    while (g < n) {
      val sub = g / subDim
      out(g) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sub, cells.getInt(sub), g % subDim,
          // Spark round(double) semantics (decimal HALF_UP), same as the
          // round(x*scale).cast(long) dataflow it replaces
          java.math.BigDecimal.valueOf(v.getFloat(g).toDouble * quantScale)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Per-vector affine int8 quantization summary in ONE pass:
    * [min, max, sum_of_codes, max_abs_reconstruction_error]. Codes are
    * floor((x-min)/scale + 0.5) with scale = (max-min)/255 — floor(+0.5)
    * instead of round() so both engines share one unambiguous halfway rule.
    * Every output is order-independent (min/max/max-err, and the code sum
    * is a sum of exact small integers in doubles), so the DuckDB replay is
    * bit-exact regardless of evaluation order. */
  def int8QuantStats(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n == 0) return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = if (mx > mn) (mx - mn) / 255.0 else 0.0
    var sum = 0.0
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val code = if (scale > 0) math.floor((x - mn) / scale + 0.5) else 0.0
      sum += code
      val err = math.abs(x - (mn + code * scale))
      if (err > maxErr) maxErr = err
      i += 1
    }
    new GenericArrayData(Array(mn, mx, sum, maxErr))
  }

  // ---------------------------------------------------------------- LSH

  /** LSH geometry — must stay in sync with the recall spec in
    * SimilaritySpec / TrainingOpsSpec. */
  val NumTables = 4
  val NumPlanes = 6
  val MaxDim = 64

  /** Deterministic pseudo-random hyperplane component (identical formula to
    * round-1's SQL-inlined `Similarity.planeComponent` — signatures are
    * bit-for-bit unchanged, so bucket assignments and the recall spec hold).
    * Public so the DuckDB oracle can inline the same constants. */
  def planeComponent(t: Int, p: Int, d: Int): Double = {
    val h = (t * 7919 + p * 1000003 + d * 8191) * 2654435761L
    ((h >>> 16) % 2001L - 1000L) / 1000.0
  }

  /** planes(t)(p)(d), precomputed once per JVM. */
  private val planes: Array[Array[Array[Double]]] =
    Array.tabulate(NumTables, NumPlanes, MaxDim)(planeComponent)

  /** All `NumTables` sign-bit signatures of one vector in a single pass —
    * replaces 4 separate ~384-term inlined projections (one corpus re-scan
    * per hash table) with one codegen'd static call. */
  def lshSignatures(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), MaxDim)
    val vd = new Array[Double](n)
    var i = 0
    while (i < n) { vd(i) = v.getFloat(i).toDouble; i += 1 }
    val sigs = new Array[Int](NumTables)
    var t = 0
    while (t < NumTables) {
      var sig = 0
      var p = 0
      while (p < NumPlanes) {
        val plane = planes(t)(p)
        var s = 0.0
        var d = 0
        while (d < n) { s += vd(d) * plane(d); d += 1 }
        if (s >= 0) sig |= 1 << p
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }
}
