package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Sessions

/** Volume / recovery behavior of the dedup suite that the per-query DuckDB
  * oracle can't pin on its own:
  *
  *  - the DF-cap skew defense must ACTUALLY ENGAGE under replicated volume
  *    (hot shingles trimmed, join bounded, wall-time sane), and
  *  - MinHash+LSH must RECOVER planted near-duplicates against an
  *    independent plain-Scala exact-Jaccard ground truth (end-to-end recall,
  *    which the per-kernel golden vectors and properties don't give).
  */
class DedupVolumeSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("dfcap under 10x near-dup volume: cap engages and join stays bounded") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, dir)
    val rep = TextDedup.replicateNearDup(docs)

    // precondition: the base corpus has shingles shared by >= 2 docs (else
    // the stress proves nothing) …
    val baseSh = TextDedup.shingleRowsOf(docs)
    val hotBase = baseSh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).count()
    assert(hotBase > 0, "fixture must contain cross-doc shared shingles")

    // … and under 10x replication those exceed DfCap: the trim must engage
    val repSh = TextDedup.shingleRowsOf(rep)
    val trimmed = repSh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > TextDedup.DfCap).count()
    assert(trimmed >= hotBase, s"cap must trim the hot shingles (trimmed=$trimmed)")

    // STRUCTURAL boundedness (machine-load-independent): the candidate
    // equi-join emits exactly sum over surviving shingles of C(df,2) pairs.
    // With the cap that mass must be a small fraction of the uncapped
    // sum — the hot-shingle blow-up the cap exists to prevent.
    val dfAgg = repSh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .agg(
        sum((col("df") * (col("df") - 1) / 2).cast("long")).as("uncapped"),
        sum(when(col("df") <= TextDedup.DfCap,
          (col("df") * (col("df") - 1) / 2).cast("long")).otherwise(0L)).as("capped"))
      .first()
    val (uncapped, capped) = (dfAgg.getLong(0), dfAgg.getLong(1))
    // ~19 shingles/doc × C(DfCap,2)=45 within-replica pairs ≈ 85/doc here;
    // 200/doc leaves headroom while still failing on any quadratic blow-up
    val nDocs = rep.count()
    assert(capped < 200L * nDocs,
      s"capped candidate mass $capped not O(docs) for $nDocs docs")
    assert(uncapped >= 5L * capped,
      s"cap removed too little: uncapped=$uncapped capped=$capped")

    val t0 = System.nanoTime()
    val pairs = TextDedup.dfcapPairsOf(repSh)
      .select(col("id_a"), col("id_b")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // wall-clock check only on a known-idle box (bench protocol): correctness
    // CI boxes can be contended, which this assert would misread as a defect
    if (sys.env.contains("GRAFT_TIMING_ASSERTS"))
      assert(secs < 60.0, s"10x dfcap run took $secs s — join no longer bounded")

    // with the cap in force, cross-doc shingles (orig df>=2 -> df>=20) are
    // all trimmed: every surviving pair must be within one replica group
    assert(pairs.nonEmpty, "replica near-dup pairs must survive the cap")
    val crossGroup = pairs.count(r => r.getLong(0) / 10 != r.getLong(1) / 10)
    assert(crossGroup == 0, s"$crossGroup cross-group pairs leaked past the cap")

    // a full replica group pairs completely: C(10,2) = 45
    val firstGroup = pairs.map(r => (r.getLong(0) / 10, r)).filter(_._1 == pairs.head.getLong(0) / 10)
    assert(firstGroup.length == 45, s"expected 45 intra-group pairs, got ${firstGroup.length}")
  }

  test("minhash LSH recovers planted near-duplicates (independent exact-Jaccard truth)") {
    val rnd = new scala.util.Random(20260812L)
    val vocab = (0 until 400).map(i => s"w$i")
    def mkDoc(): Array[String] = Array.fill(40)(vocab(rnd.nextInt(vocab.size)))
    val bases = (0 until 40).map(_ => mkDoc())
    // plant near-dups of the first 20 docs: m in {1,2} word substitutions ->
    // expected shingle-Jaccard ~0.85 (m=1) / ~0.73 (m=2)
    val planted = (0 until 20).map { i =>
      val m = 1 + (i % 2)
      val arr = bases(i).clone()
      (0 until m).foreach(j => arr(5 + 7 * j) = s"sub${i}x$j")
      arr
    }
    val all: Seq[(Long, String)] =
      bases.zipWithIndex.map { case (w, i) => (i.toLong, w.mkString(" ")) } ++
        planted.zipWithIndex.map { case (w, i) => ((100 + i).toLong, w.mkString(" ")) }

    // independent ground truth: plain-Scala distinct word-3-grams + exact
    // Jaccard (no call into the kernels under test)
    def shingles(s: String): Set[String] = {
      val w = s.trim.split("\\s+")
      (0 to w.length - 3).map(k => w(k) + " " + w(k + 1) + " " + w(k + 2)).toSet
    }
    val sets = all.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = all.map(_._1)
    val truePairs: Map[(Long, Long), Double] = (for {
      a <- ids; b <- ids if a < b
      inter = sets(a).intersect(sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter) if j >= 0.2
    } yield ((a, b), j)).toMap

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftlsh").toString
    all.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextDedup.ddMinhashLsh(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // soundness: every reported pair is a true pair with the EXACT Jaccard
    got.foreach { case (p, j) =>
      assert(truePairs.contains(p), s"$p reported but not a true >=0.2 pair")
      assert(math.abs(j - truePairs(p)) < 5e-7, s"$p jac $j != ${truePairs(p)}")
    }
    // recall over confidently-detectable pairs: at J>=0.75 the 8x4 banding
    // detects with p >= 1-(1-0.75^4)^8 ~ 0.96 per pair
    val confident = truePairs.filter(_._2 >= 0.75).keys.toSeq
    assert(confident.nonEmpty, "fixture must contain J>=0.75 planted pairs")
    val found = confident.count(got.contains)
    assert(found.toDouble / confident.size >= 0.9,
      s"LSH recall $found/${confident.size} below 0.9 on J>=0.75 planted dups")
  }
}
