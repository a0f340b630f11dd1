package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.expr.{TextAlgo, VecAlgo}

/** Pins the vector kernels that replaced the interpreted HOF chains: the
  * cosine accumulation order, the LSH hyperplane formula (bucket ids must
  * stay stable across refactors — they are the persisted partition keys at
  * scale), and the shingle-set semantics. */
class VecAlgoSpec extends AnyFunSuite {

  private def arr(xs: Float*) = new GenericArrayData(xs.toArray)

  test("cosine matches the sequential-fold definition bit-for-bit") {
    val rnd = new scala.util.Random(1)
    for (_ <- 1 to 20) {
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      // reference: the zip_with/aggregate fold the expression replaced
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 64) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      val expected = dot / (math.sqrt(na) * math.sqrt(nb))
      val got = VecAlgo.cosine(new GenericArrayData(a), new GenericArrayData(b))
      assert(got == expected) // bit-identical, not approximate
    }
  }

  test("cosine handles orthogonal / identical / different-length vectors") {
    assert(VecAlgo.cosine(arr(1f, 0f), arr(0f, 1f)) == 0.0)
    assert(math.abs(VecAlgo.cosine(arr(1f, 2f, 3f), arr(1f, 2f, 3f)) - 1.0) < 1e-12)
    // shorter vector: dot over the overlap, norms over own lengths
    val c = VecAlgo.cosine(arr(1f, 1f), arr(1f, 1f, 1f))
    assert(math.abs(c - 2.0 / (math.sqrt(2.0) * math.sqrt(3.0))) < 1e-12)
  }

  test("LSH signatures equal the original hyperplane formula (stable buckets)") {
    // independent reimplementation of round-1's SQL-inlined signature
    def planeComponent(t: Int, p: Int, d: Int): Double = {
      val h = (t * 7919 + p * 1000003 + d * 8191) * 2654435761L
      ((h >>> 16) % 2001L - 1000L) / 1000.0
    }
    val rnd = new scala.util.Random(2)
    for (_ <- 1 to 20) {
      val v = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val sigs = VecAlgo.lshSignatures(new GenericArrayData(v)).toIntArray()
      assert(sigs.length == VecAlgo.NumTables)
      for (t <- 0 until VecAlgo.NumTables) {
        var expected = 0
        for (p <- 0 until VecAlgo.NumPlanes) {
          var s = 0.0
          for (d <- 0 until 64) s += v(d).toDouble * planeComponent(t, p, d)
          if (s >= 0) expected |= 1 << p
        }
        assert(sigs(t) == expected, s"table $t")
        assert(sigs(t) >= 0 && sigs(t) < 64)
      }
    }
  }

  // Independent re-statement of the oracle-replayable polynomial hash: a
  // plain foldLeft over codepoints, NOT TextAlgo.polyHash (the kernel under
  // test must never compute its own expected value).
  private val PolyP = 2147483647L
  private def polyRef(s: String, base: Long): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * base + cp) % PolyP)

  // Independent tokenization with split(trim(text), '\\s+') semantics:
  // empty/blank input yields one empty token (String.split behavior).
  private def tokensRef(text: String): Array[String] =
    (if (text == null) "" else text.trim).split("\\s+")

  test("simhash62 is bit-identical to an independent dual-polyHash vote fold") {
    val spark = Sessions.local(2)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with other words entirely"),
      (4L, "single"),
      (5L, ""),
      (6L, "   "))
    def simhashRef(text: String): Long = {
      val votes = new Array[Int](62)
      for (w <- tokensRef(text)) {
        val h1 = polyRef(w, 31L)
        val h2 = polyRef(w, 131L)
        for (bit <- 0 until 31) {
          if (((h1 >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          if (((h2 >> bit) & 1L) == 1L) votes(bit + 31) += 1 else votes(bit + 31) -= 1
        }
      }
      (0 until 62).foldLeft(0L)((acc, bit) => if (votes(bit) > 0) acc | (1L << bit) else acc)
    }
    val expected = texts.map { case (id, t) => id -> simhashRef(t) }.toMap
    val df = texts.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), graft.expr.functions.simhash62(col("text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // 62-bit range: top two bits of the Long must be clear
    got.values.foreach(s => assert((s >>> 62) == 0L))
    // near-identical texts (1 vs 2) must land closer than unrelated (1 vs 3)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(1L), got(2L)) < hamming(got(1L), got(3L)))
  }

  test("minhash_sigs is identical to an independent polyHash min-fold over shingles") {
    val spark = Sessions.local(2)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma alpha beta gamma alpha beta"),
      (4L, "too short"))
    // independent shingling: distinct word 3-grams in first-seen order
    def shinglesRef(text: String): Seq[String] = {
      val toks = tokensRef(text).filter(_.nonEmpty)
      if (toks.length < 3) Seq.empty
      else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    def minhashRef(text: String): Seq[Long] = {
      val sh = shinglesRef(text)
      if (sh.isEmpty) return Seq.empty
      (0 until 32).map { k =>
        val a = 1103515245L * (k + 1) % PolyP
        val b = (12345L + 2654435761L * k) % PolyP
        sh.map(s => (a * polyRef(s, 31L) + b) % PolyP).min
      }
    }
    val expected =
      texts.flatMap { case (id, t) =>
        val sig = minhashRef(t); if (sig.isEmpty) None else Some(id -> sig)
      }.toMap
    val df = texts.toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), graft.expr.functions.minhash_sigs(col("text")).as("sigs"))
      .filter(size(col("sigs")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == expected) // doc 4 (no shingles) absent from both
    assert(!got.contains(4L))
  }

  test("nearestCells equals round(cosineFD, 6) + (sim DESC, cell ASC) ranking") {
    val spark = Sessions.local(2)
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val dim = 7
    val cents: Array[Array[Double]] =
      Array.fill(5)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    // include a vector equal to a centroid (sim exactly 1.0) and ties-by-
    // construction (duplicate centroid rows force the cell_id tie-break)
    val tied = cents :+ cents(2).clone()
    val vecs = (0 until 50).map(i =>
      i.toLong -> Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)) :+
      (99L -> cents(3).map(_.toFloat))
    val rows = vecs.map { case (id, v) => org.apache.spark.sql.Row(id, v.toSeq) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    // reference: per (vec, cell) rounded cosineFD, ranked (sim DESC, cell ASC)
    val expect = vecs.map { case (id, v) =>
      val va = new GenericArrayData(v)
      val sims = tied.indices.map { c =>
        c.toLong -> VecAlgo.round6(VecAlgo.cosineFD(va, new GenericArrayData(tied(c))))
      }
      id -> sims.sortBy { case (c, s) => (-s, c) }.take(2)
    }.toMap
    val got = df.select(col("vec_id"),
        graft.expr.functions.nearest_cells(col("embedding"), tied, 2).as("nc"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1))))
      .toMap
    vecs.foreach { case (id, _) =>
      assert(got(id) == expect(id), s"vec $id: ${got(id)} vs ${expect(id)}")
    }
    // the duplicate centroid pair must rank lower cell first on the tie
    val dupRanks = got(99L).map(_._1)
    assert(!(dupRanks.contains(5L) && !dupRanks.contains(2L)),
      "tie between duplicate centroids must prefer the lower cell id")
  }

  // ---- ScalaCheck properties for the dedup kernels: these survive future
  // hash swaps (they pin SEMANTICS, not constants — the golden folds above
  // pin the constants).
  private def forAllP[A](gen: org.scalacheck.Gen[A], n: Int = 150)(f: A => Unit): Unit =
    PropDrive.forAll(gen, n, seed0 = 7L)(f)
  private val tokGen = org.scalacheck.Gen.nonEmptyListOf(org.scalacheck.Gen.alphaLowerChar).map(_.mkString)
  private def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  test("property: identical texts hash identically; ranges hold") {
    forAllP(org.scalacheck.Gen.listOf(tokGen)) { toks =>
      val text = toks.mkString(" ")
      val s1 = VecAlgo.simHash62(utf8(text))
      assert(s1 == VecAlgo.simHash62(utf8(text)), "simhash deterministic")
      assert((s1 >>> 62) == 0L, "simhash stays within 62 bits")
      val m1 = VecAlgo.minHashSigs(utf8(text)).toLongArray()
      assert(m1.sameElements(VecAlgo.minHashSigs(utf8(text)).toLongArray()))
      assert(m1.length == 0 || m1.length == VecAlgo.NumMinHashes, "0 or exactly 32 sigs")
      m1.foreach(v => assert(v >= 0L && v < VecAlgo.MinHashP, "sig in [0, p)"))
      assert(m1.isEmpty == (toks.length < 3), "empty iff fewer than 3 tokens")
    }
  }

  test("property: simhash is token-order invariant (commutative vote sum), multiset-sensitive") {
    forAllP(org.scalacheck.Gen.zip(org.scalacheck.Gen.nonEmptyListOf(tokGen), org.scalacheck.Gen.long)) {
      case (toks, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(toks)
        assert(VecAlgo.simHash62(utf8(toks.mkString(" "))) ==
               VecAlgo.simHash62(utf8(shuffled.mkString(" "))))
    }
    // but NOT repetition-invariant: an outvoted token flips bits — with one
    // "alpha" the two tokens tie everywhere (ties vote 0 -> bit clear), with
    // three "alpha"s alpha wins outright, so the hashes must differ
    val once = VecAlgo.simHash62(utf8("alpha beta"))
    val thrice = VecAlgo.simHash62(utf8("alpha alpha alpha beta"))
    assert(once != thrice, "repetition must shift the vote")
  }

  test("property: minhash has shingle-SET semantics (duplicate shingles don't matter)") {
    // "x y x y x" and "x y x y x y x" have different shingle MULTISETS but
    // the same distinct-shingle SET {"x y x", "y x y"} -> identical sigs
    forAllP(org.scalacheck.Gen.zip(tokGen, tokGen), 80) { case (x, y) =>
      val short = s"$x $y $x $y $x"
      val long = s"$x $y $x $y $x $y $x"
      assert(VecAlgo.minHashSigs(utf8(short)).toLongArray()
        .sameElements(VecAlgo.minHashSigs(utf8(long)).toLongArray()))
    }
  }

  test("repetitionCounts: word-soup, single word, empty text") {
    // "a b a b a": 5 words, 2 distinct, top=3; bigrams [a b, b a, a b, b a]
    // = 4 total, 2 distinct
    assert(TextAlgo.repetitionCounts("a b a b a").toSeq == Seq(5L, 2L, 3L, 4L, 2L))
    // single word: one 1-count word, no bigrams
    assert(TextAlgo.repetitionCounts("solo").toSeq == Seq(1L, 1L, 1L, 0L, 0L))
    // empty/blank: split(trim) yields one empty token (Spark split semantics)
    assert(TextAlgo.repetitionCounts("").toSeq == Seq(1L, 1L, 1L, 0L, 0L))
    assert(TextAlgo.repetitionCounts("   ").toSeq == Seq(1L, 1L, 1L, 0L, 0L))
  }

  test("int8QuantStats: exact codes, constant vector, reconstruction bound") {
    def stats(xs: Float*) = VecAlgo.int8QuantStats(arr(xs: _*)).toDoubleArray().toSeq
    // [0, 1]: scale = 1/255; codes 0 and 255; errors exactly 0
    assert(stats(0f, 1f) == Seq(0.0, 1.0, 255.0, 0.0))
    // constant vector: scale 0, all codes 0, perfect reconstruction
    assert(stats(0.5f, 0.5f, 0.5f) == Seq(0.5, 0.5, 0.0, 0.0))
    // random-ish values: max error bounded by scale/2
    val xs = Array(-0.37f, 0.82f, 0.11f, -0.92f, 0.44f)
    val Seq(mn, mx, _, err) = stats(xs.toIndexedSeq: _*)
    assert(mn == -0.92f.toDouble && mx == 0.82f.toDouble)
    assert(err <= (mx - mn) / 255.0 / 2 + 1e-12, s"err $err exceeds scale/2")
  }

  test("wordShingles: distinct 3-grams, empty below 3 tokens") {
    assert(TextAlgo.wordShingles("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(TextAlgo.wordShingles("x y x y x y").toSeq == Seq("x y x", "y x y"))
    assert(TextAlgo.wordShingles("one two").isEmpty)
    assert(TextAlgo.wordShingles("  ").isEmpty)
    assert(TextAlgo.wordShingles(null).isEmpty)
    assert(TextAlgo.wordShingles(" a\t b\n c ").toSeq == Seq("a b c"))
  }
}
