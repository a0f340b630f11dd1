package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, QuinaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §2.10): null-safe, codegen-capable
  * (each emits a static call into [[TextAlgo]], so whole-stage codegen spans
  * stay unbroken — no Scala-closure UDF boxing in the hot join path J5).
  */
object Expressions {

  private val algo = "graft.expr.TextAlgo"

  /** normalize_text (P12; matching.py:19-72). */
  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(TextAlgo.normalize(v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString($algo.normalize($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** remove_stopwords (P13; scoring.py:270-279): KISS FR/venue stopword
    * strip + ≤2-codepoint token drop, single-space rejoin. */
  case class RemoveStopwords(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(TextAlgo.removeStopwords(v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString($algo.removeStopwords($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** trigram_similarity (scoring.py:250-267). */
  case class TrigramSimilarity(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      TextAlgo.trigramSimilarity(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) =>
        s"$algo.trigramSimilarity($l.toString(), $r.toString())")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** fuzzy_ratio — Ratcliff-Obershelp, SequenceMatcher semantics (scoring.py:219). */
  case class FuzzyRatio(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      TextAlgo.fuzzyRatio(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) =>
        s"$algo.fuzzyRatio($l.toString(), $r.toString())")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** name_score — max(fuzzy, trigram, fuzzy(nostop)) (scoring.py:209-230). */
  case class NameScore(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      TextAlgo.nameScore(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) =>
        s"$algo.nameScore($l.toString(), $r.toString())")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** dedupe_key (dedup.py:18-45). */
  case class DedupeKey(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(TextAlgo.dedupeKey(v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString($algo.dedupeKey($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** domain_of, single-url form (domains.py:34-83). */
  case class DomainOf(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(TextAlgo.domainOf(v.asInstanceOf[UTF8String].toString, null, null))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString($algo.domainOf($c.toString(), null, null))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** apex_domain (domains.py:13-32). */
  case class ApexDomain(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(TextAlgo.apexDomain(v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString($algo.apexDomain($c.toString()))")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  private val vec = "graft.expr.VecAlgo"

  /** Codegen'd cosine similarity over float-array columns — replaces the
    * interpreted zip_with/aggregate HOF chain (same sequential-in-double
    * accumulation, bit-identical results). */
  case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      VecAlgo.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) => s"$vec.cosine($l, $r)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** Cosine similarity of a float-array column against a double-array column
    * (embedding vs k-means centroid) — codegen'd like [[CosineSimilarity]]. */
  case class CosineSimilarityFD(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      VecAlgo.cosineFD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) => s"$vec.cosineFD($l, $r)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** P7 tag-criteria predicate + match-score fused into one codegen'd pass
    * over the tag array: Σ confidences of matching required tags, or NULL
    * when ineligible (no required match / any excluded match at min
    * confidence). Replaces three interpreted HOF lambdas per (poi × template)
    * row — the multiplier that bites with real collection catalogs. */
  case class TagMatchScore(first: Expression, second: Expression, third: Expression,
      fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def nullSafeEval(tags: Any, req: Any, exc: Any, minConf: Any): Any =
      VecAlgo.tagMatchScore(tags.asInstanceOf[ArrayData], req.asInstanceOf[ArrayData],
        exc.asInstanceOf[ArrayData], minConf.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, r, x, m) => {
        val box = ctx.freshName("tagScore")
        s"""java.lang.Double $box = $vec.tagMatchScore($t, $r, $x, $m);
           |if ($box == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $box.doubleValue(); }
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression, d: Expression): Expression = copy(a, b, c, d)
  }

  /** Top-k nearest-centroid assignment of a float vector against a LITERAL
    * flattened centroid matrix (the 2 KB k-means model, shipped with the
    * plan like MLlib ships centers) — one codegen'd pass per row instead of
    * a 16-way crossJoin + window shuffle. Ranking contract matches the
    * dataflow it replaces: 6-dp-rounded [[CosineSimilarityFD]] DESC, cell
    * ASC. Returns array<struct<cell_id, sim>> of length k. */
  case class NearestCells(first: Expression, second: Expression, third: Expression,
      fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell_id", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sim", DoubleType, nullable = false))),
        containsNull = false)
    override protected def nullSafeEval(v: Any, flat: Any, nc: Any, k: Any): Any =
      VecAlgo.nearestCells(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
        nc.asInstanceOf[Int], k.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, f, n, k) => s"$vec.nearestCells($v, $f, $n, $k)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression, d: Expression): Expression = copy(a, b, c, d)
  }

  /** PQ code assignment of a float vector against a LITERAL flattened
    * codebook tensor (numSub × numCodes × subDim — the driver-side PQ
    * model) — one codegen'd pass per row instead of a centroid-join
    * expansion + two grouped shuffles. Same (6-dp-rounded squared-L2, cell
    * ASC) contract as the dataflow it replaces. Returns array<int>. */
  case class PqCells(first: Expression, second: Expression, third: Expression,
      fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(v: Any, flat: Any, ns: Any, nc: Any): Any =
      VecAlgo.pqCells(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
        ns.asInstanceOf[Int], nc.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (v, f, n, k) => s"$vec.pqCells($v, $f, $n, $k)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression, d: Expression): Expression = copy(a, b, c, d)
  }

  /** Per-vector PQ training contribution rows (assignment + quantized
    * components) — see [[VecAlgo.pqContrib]]; built to sit INSIDE a
    * posexplode so the assignment runs once per vector. */
  case class PqContrib(first: Expression, second: Expression, third: Expression,
      fourth: Expression, fifth: Expression) extends QuinaryExpression {
    override def children: Seq[Expression] = Seq(first, second, third, fourth, fifth)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sub", IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cell", IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("dim", IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("qv", LongType, nullable = false))),
        containsNull = false)
    override protected def nullSafeEval(v: Any, flat: Any, ns: Any, nc: Any, qs: Any): Any =
      VecAlgo.pqContrib(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
        ns.asInstanceOf[Int], nc.asInstanceOf[Int], qs.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, f, n, k, q) =>
        s"${ev.value} = $vec.pqContrib($v, $f, $n, $k, $q);")
    override protected def withNewChildrenInternal(ch: IndexedSeq[Expression]): Expression =
      copy(ch(0), ch(1), ch(2), ch(3), ch(4))
  }

  /** Ray-cast containment of (lng, lat) in a ring column (J1 hot filter;
    * replaces the boxing Scala-closure UDF). */
  case class PointInRing(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    // declared input types let SQL callers pass decimal/int literals — the
    // analyzer inserts the cast; exact-typed Scala callers are unchanged
    override def inputTypes: Seq[DataType] =
      Seq(DoubleType, DoubleType, ArrayType(ArrayType(DoubleType)))
    override def dataType: DataType = BooleanType
    override def nullSafeEval(lng: Any, lat: Any, ring: Any): Any =
      VecAlgo.pointInRing(lng.asInstanceOf[Double], lat.asInstanceOf[Double],
        ring.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"$vec.pointInRing($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
      copy(a, b, c)
  }

  /** Hex cell id of (lat, lng) at a fixed resolution (spatial bucketing key). */
  case class CellOf(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(DoubleType, DoubleType, IntegerType)
    override def dataType: DataType = StringType
    override def nullSafeEval(lat: Any, lng: Any, res: Any): Any =
      VecAlgo.latLngCell(lat.asInstanceOf[Double], lng.asInstanceOf[Double],
        res.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"$vec.latLngCell($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
      copy(a, b, c)
  }

  /** The cell cover of a polygon ring at a resolution — [[CellGrid
    * .polygonCover]] as a Catalyst expression so the spatial-join rewrite
    * rule can build the cover inside the plan (one eval per POLYGON row, a
    * cold path — interpreted eval is fine). */
  case class PolygonCoverCells(left: Expression, right: Expression)
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(ringRaw: Any, resRaw: Any): Any = {
      val ad = ringRaw.asInstanceOf[ArrayData]
      val ring = Array.tabulate(ad.numElements()) { i =>
        val p = ad.getArray(i)
        Array(p.getDouble(0), p.getDouble(1))
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        CellGrid.polygonCover(ring, resRaw.asInstanceOf[Int])
          .map(org.apache.spark.unsafe.types.UTF8String.fromString))
    }
    override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
      copy(a, b)
  }

  /** [[PolygonCoverCells]] with the per-cell INTERIOR flag
    * (CellGrid.polygonCoverFlagged): array<struct<cell, interior>>. An
    * interior cell's points are contained without the exact ray-cast —
    * the cell-join paths test `interior OR point_in_ring(...)`. */
  case class PolygonCoverFlagged(left: Expression, right: Expression)
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("interior", BooleanType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(ringRaw: Any, resRaw: Any): Any = {
      val ad = ringRaw.asInstanceOf[ArrayData]
      val ring = Array.tabulate(ad.numElements()) { i =>
        val p = ad.getArray(i)
        Array(p.getDouble(0), p.getDouble(1))
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        CellGrid.polygonCoverFlagged(ring, resRaw.asInstanceOf[Int]).map {
          case (c, in) => org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(c), in)
        })
    }
    override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
      copy(a, b)
  }

  /** The 7 aperture-7 children of a hex cell id. */
  case class CellChildren(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.cellChildrenData(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.cellChildrenData($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** ASCII char-set bitmasks of a text column (array<bigint> of [lo, hi])
    * in one codegen'd pass. */
  case class AsciiMasks(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.asciiMasks(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.asciiMasks($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** All 32 MinHash signature values of a text column in one codegen'd pass
    * (array<bigint>; empty when the doc has no shingles). */
  case class MinHashSigs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.minHashSigs(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.minHashSigs($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** 62-bit SimHash of a text column in one codegen'd pass (two polynomial
    * token hashes, bases 31/131 — oracle-replayable in DuckDB). */
  case class SimHash62(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      VecAlgo.simHash62(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.simHash62($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Per-vector affine int8 quantization summary of a float-array column in
    * one codegen'd pass (array<double>: min, max, sum_codes, max_abs_err). */
  case class Int8QuantStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.int8QuantStats(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.int8QuantStats($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Gopher-style repetition counters of a text column in one codegen'd pass
    * (array<bigint>: n_words, n_distinct_words, top_word_count, n_bigrams,
    * n_distinct_bigrams). */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.repetitionCountsData(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.repetitionCountsData($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Distinct word 3-gram shingles of a text column in one codegen'd pass
    * (the MinHash/Jaccard shingle set). */
  case class WordShingles(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.wordShingleData(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.wordShingleData($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Distinct word n-grams of a text column (generalized WordShingles; n is
    * a literal) in one codegen'd pass. */
  case class WordNgrams(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(t: Any, n: Any): Any =
      VecAlgo.wordNgramData(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, n) => s"$vec.wordNgramData($t, $n)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** All 4 LSH hyperplane-table signatures of a float vector in one pass
    * (array<int> of length VecAlgo.NumTables). */
  case class LshSignatures(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VecAlgo.lshSignatures(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$vec.lshSignatures($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
}

/** Column-level API + SQL registration for the custom expressions. */
object functions {
  import Expressions._

  private def asCol(e: Expression): Column = org.apache.spark.sql.GraftColumnBridge.toColumn(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.GraftColumnBridge.toExpression(c)

  def normalize_text(c: Column): Column = asCol(NormalizeText(expr(c)))
  def remove_stopwords(c: Column): Column = asCol(RemoveStopwords(expr(c)))
  def trigram_similarity(a: Column, b: Column): Column = asCol(TrigramSimilarity(expr(a), expr(b)))
  def fuzzy_ratio(a: Column, b: Column): Column = asCol(FuzzyRatio(expr(a), expr(b)))
  def name_score(a: Column, b: Column): Column = asCol(NameScore(expr(a), expr(b)))
  def dedupe_key(c: Column): Column = asCol(DedupeKey(expr(c)))
  def domain_of(c: Column): Column = asCol(DomainOf(expr(c)))
  def apex_domain(c: Column): Column = asCol(ApexDomain(expr(c)))
  def cosine_similarity(a: Column, b: Column): Column = asCol(CosineSimilarity(expr(a), expr(b)))
  def cosine_similarity_fd(a: Column, b: Column): Column = asCol(CosineSimilarityFD(expr(a), expr(b)))
  def lsh_signatures(c: Column): Column = asCol(LshSignatures(expr(c)))
  def word_shingles(c: Column): Column = asCol(WordShingles(expr(c)))
  def simhash62(c: Column): Column = asCol(SimHash62(expr(c)))
  def ascii_masks(c: Column): Column = asCol(AsciiMasks(expr(c)))
  def minhash_sigs(c: Column): Column = asCol(MinHashSigs(expr(c)))
  def repetition_stats(c: Column): Column = asCol(RepetitionStats(expr(c)))
  def int8_quant_stats(c: Column): Column = asCol(Int8QuantStats(expr(c)))
  def word_ngrams(c: Column, n: Column): Column = asCol(WordNgrams(expr(c), expr(n)))
  /** Top-k (cell_id, sim) of a float-vector column vs a driver-side centroid
    * model — the matrix is flattened into a plan literal. */
  def nearest_cells(vec: Column, centroids: Array[Array[Double]], k: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT, IntegerType => IT}
    val flat = Literal.create(centroids.flatten, AT(DT, containsNull = false))
    asCol(NearestCells(expr(vec), flat, Literal(centroids.length, IT), Literal(k, IT)))
  }

  /** PQ codes (one per subspace) of a float-vector column vs a driver-side
    * codebook model — the tensor is flattened into a plan literal. */
  def pq_cells(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT, IntegerType => IT}
    val flat = Literal.create(codebooks.flatMap(_.flatten), AT(DT, containsNull = false))
    asCol(PqCells(expr(vec), flat, Literal(codebooks.length, IT),
      Literal(codebooks.head.length, IT)))
  }

  /** PQ training contribution rows of a float-vector column vs a driver-side
    * codebook model (posexplode this — assignment runs once per vector). */
  def pq_contrib(vec: Column, codebooks: Array[Array[Array[Double]]],
      quantScale: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT, IntegerType => IT}
    val flat = Literal.create(codebooks.flatMap(_.flatten), AT(DT, containsNull = false))
    asCol(PqContrib(expr(vec), flat, Literal(codebooks.length, IT),
      Literal(codebooks.head.length, IT), Literal(quantScale, DT)))
  }

  def tag_match_score(tags: Column, req: Column, exc: Column, minConf: Column): Column =
    asCol(TagMatchScore(expr(tags), expr(req), expr(exc), expr(minConf)))
  def point_in_ring(lng: Column, lat: Column, ring: Column): Column =
    asCol(PointInRing(expr(lng), expr(lat), expr(ring)))
  def cell_of(lat: Column, lng: Column, res: Column): Column =
    asCol(CellOf(expr(lat), expr(lng), expr(res)))
  def cell_children(c: Column): Column = asCol(CellChildren(expr(c)))

  /** Haversine meters composed from built-in trig (codegen'd end-to-end;
    * matching.py:102-115 semantics, R=6371000). */
  def haversine_meters(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    import org.apache.spark.sql.functions._
    val r = lit(6371000.0)
    val phi1 = radians(lat1)
    val phi2 = radians(lat2)
    val dPhi = radians(lat2 - lat1)
    val dLambda = radians(lng2 - lng1)
    val a = pow(sin(dPhi / 2), 2) + cos(phi1) * cos(phi2) * pow(sin(dLambda / 2), 2)
    r * lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** (name → builder) pairs for SQL registration — one list shared by the
    * session-scoped [[registerAll]] and the build-time
    * [[graft.GraftExtensions]] injection, so the two surfaces can't drift. */
  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "normalize_text" -> (es => NormalizeText(es.head)),
    "remove_stopwords" -> (es => RemoveStopwords(es.head)),
    "trigram_similarity" -> (es => TrigramSimilarity(es(0), es(1))),
    "fuzzy_ratio" -> (es => FuzzyRatio(es(0), es(1))),
    "name_score" -> (es => NameScore(es(0), es(1))),
    "dedupe_key" -> (es => DedupeKey(es.head)),
    "domain_of" -> (es => DomainOf(es.head)),
    "apex_domain" -> (es => ApexDomain(es.head)),
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "lsh_signatures" -> (es => LshSignatures(es.head)),
    "word_shingles" -> (es => WordShingles(es.head)),
    "simhash62" -> (es => SimHash62(es.head)),
    "point_in_ring" -> (es => PointInRing(es(0), es(1), es(2))),
    "cell_of" -> (es => CellOf(es(0), es(1), es(2))),
    "cell_children" -> (es => CellChildren(es.head)),
    "polygon_cover_cells" -> (es => PolygonCoverCells(es(0), es(1))))

  /** Register all custom expressions for SQL use in an EXISTING session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
