package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches

/** Pins what the driver's hash gate can't about the HLL operator: the
  * generated hex/rho ladders against an independent JVM MessageDigest
  * reference, exact merge ≡ direct register equality (associativity of the
  * bucket-wise max), and the estimator's accuracy envelope. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  /** Independent reference: md5-hex → (bucket, rho) with plain JVM parsing. */
  private def ref(userId: Long): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(userId.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val bucket = java.lang.Long.parseLong(hex.substring(0, 2), 16)
    val w = java.lang.Long.parseLong(hex.substring(2, 10), 16)
    val rho = if (w == 0) 33L else (java.lang.Long.numberOfLeadingZeros(w) - 31).toLong
    (bucket, rho)
  }

  test("generated hex/rho ladders match the MessageDigest reference") {
    val rows = Sketches.sketchRows(spark, sf)
      .select(col("user_id"), col("bucket"), col("rho")).distinct()
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (u, got) =>
      assert(got == ref(u), s"user $u: sketch projection diverges from reference")
    }
  }

  test("per-day merged registers give exactly the direct estimate") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = canon(Sketches.skHllDistinct(spark, sf))
    assert(direct.nonEmpty && canon(Sketches.skHllMerge(spark, sf)) == direct,
      "register merge is not transparent")
  }

  test("histogram quantile estimates are within one bin of the exact rank statistic") {
    // exact order statistic at the SAME rank the sketch targets (ceil(q·n))
    val byGroup = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    val est = Sketches.skHistQuantiles(spark, sf).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val sortedVals = byGroup(r.getString(0))
      assert(r.getLong(1) == sortedVals.length, "n_rows mismatch")
      Seq(2, 3, 4).zip(Sketches.Quantiles.map(_._2)).foreach { case (i, q) =>
        val exactV = sortedVals(math.ceil(q * sortedVals.length).toInt - 1)
        val e = r.getLong(i).toDouble
        // the estimate is the upper edge of the bin holding that value
        assert(e > exactV - 1e-9 && e - exactV <= Sketches.BinW + 1e-9,
          s"${r.getString(0)} q=$q: est $e vs exact $exactV outside one bin")
      }
    }
  }

  test("bloom probe: zero false negatives on the build segment, bounded FPs elsewhere") {
    val bySeg = Sketches.skBloomProbe(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (bn, bf) = bySeg("BUILDING")
    assert(bn > 0 && bf == bn, "a bloom filter must never false-negative its build set")
    val (on, of) = bySeg.view.filterKeys(_ != "BUILDING").values
      .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    // theoretical FP at k=3, m=4096, n≈300 is ~0.8%; envelope 5%
    assert(on > 0 && of.toDouble / on < 0.05,
      s"false-positive rate ${of.toDouble / on} out of envelope ($of of $on)")
  }

  test("estimate lands within the m=256 HLL error envelope") {
    Sketches.skHllDistinct(spark, sf).collect().foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(3))
      assert(math.abs(est - exact) / exact < 0.15,
        s"${r.getString(0)}: est $est vs exact $exact out of envelope")
    }
  }

  test("approx profiler: every column's estimate lands in the HLL envelope") {
    graft.ops.Quality.dqProfileApprox(spark, sf).collect().foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(3))
      // m=256 keeps ±1.3σ ≈ 8.5% for large n; the small-n linear-counting
      // branch is tighter — 15% is the house envelope (cf. the HLL tests)
      assert(math.abs(est - exact) / math.max(exact, 1.0) < 0.15,
        s"${r.getString(0)}: est $est vs exact $exact out of envelope")
    }
  }

  test("HLL intersection: inclusion-exclusion identity holds, error in envelope") {
    val r = Sketches.skHllIntersect(spark, sf).collect().head
    val (na, nb, ni) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (ea, eb, eu, ei) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(na > ni && nb > ni && ni > 0, "sets must partially overlap or the op is vacuous")
    // the identity is exact BY CONSTRUCTION (ei derives from the three ests)
    assert(math.abs(ei - (ea + eb - eu)) < 1e-6)
    // per-set error carries HLL's envelope; inclusion-exclusion compounds it
    assert(math.abs(ea - na) / na < 0.15 && math.abs(eb - nb) / nb < 0.15)
    assert(math.abs(ei - ni) / ni < 0.30, s"intersection est $ei vs exact $ni")
  }

  test("count-min estimates only ever OVERcount, within the ε·N envelope") {
    val rows = Sketches.skCmsHeavy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Sketches.CmsTopK)
    val nTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).count()
    // CMS guarantee: exact ≤ est, and est − exact ≤ e·N/W per row whp;
    // min over d=4 rows makes the slack comfortably inside 3·N/W here
    val slack = 3.0 * nTokens / Sketches.CmsW
    rows.foreach { case (w, exact, est) =>
      assert(est >= exact, s"'$w': CMS undercounted ($est < $exact)")
      assert(est - exact <= slack, s"'$w': overcount ${est - exact} > $slack")
    }
    assert(rows.exists { case (_, exact, est) => est == exact },
      "expected at least one collision-free cell at this sketch load")
  }
}
