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

  test("wordShingles: distinct 3-grams, empty below 3 tokens") {
    assert(TextAlgo.wordShingles("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(TextAlgo.wordShingles("x y x y x y").toSeq == Seq("x y x", "y x y"))
    assert(TextAlgo.wordShingles("one two").isEmpty)
    assert(TextAlgo.wordShingles("  ").isEmpty)
    assert(TextAlgo.wordShingles(null).isEmpty)
    assert(TextAlgo.wordShingles(" a\t b\n c ").toSeq == Seq("a b c"))
  }
}
