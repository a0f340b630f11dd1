package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity, TextDedup}

/** Behavioral specs for the probabilistic training-data operators — the
  * driver's oracle only does rows-only checks on these, so recall and
  * invariants are pinned here. */
class TrainingOpsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("MinHash+LSH finds true near-duplicates (high-jaccard pairs)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val dir = writeDocs(Seq(
      (1L, base, "en", "s1", 10L),
      (2L, base + " tonight", "en", "s1", 10L),              // ~0.87 jaccard
      (3L, "completely different words entirely unrelated content here now", "en", "s1", 10L),
      (4L, base.replace("quick", "fast"), "en", "s1", 10L))) // still high overlap
    val pairs = TextDedup.ddMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-identical pair must be found")
    assert(pairs.contains((1L, 4L)), "one-word-substitution pair must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("dup clusters: transitive chain A~B~C with A!~C becomes ONE cluster") {
    val a = (1 to 12).map(i => s"alpha$i").mkString(" ")           // A1..A12
    val b = (1 to 6).map(i => s"alpha$i").mkString(" ") + " " +
      (7 to 12).map(i => s"beta$i").mkString(" ")                  // A1..A6 B7..B12
    val c = (1 to 6).map(i => s"gamma$i").mkString(" ") + " " +
      (7 to 12).map(i => s"beta$i").mkString(" ")                  // C1..C6 B7..B12
    val dir = writeDocs(Seq(
      (1L, a, "en", "s1", 10L),
      (2L, b, "en", "s1", 10L),   // jac(1,2) = 4/16 = 0.25
      (3L, c, "en", "s1", 10L),   // jac(2,3) = 0.25, jac(1,3) = 0
      (4L, "unrelated words entirely different from the others here", "en", "s1", 10L)))
    val rows = TextDedup.ddDupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)),
      s"expected one 3-cluster with canonical 1, got $rows")
  }

  test("SimHash: identical texts collide at hamming 0; near texts are close") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = writeDocs(Seq(
      (1L, base, "en", "s1", 10L),
      (2L, base, "en", "s1", 10L),
      (3L, base + " lambda", "en", "s1", 10L)))
    val pairs = TextDedup.ddSimhash(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0L, "identical docs must have hamming distance 0")
    pairs.get((1L, 3L)).foreach(h => assert(h <= 3L))
  }

  test("LSH ANN recall vs brute force on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val bf = Similarity.simBruteforceTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.simLshTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.3, s"multi-probe LSH recall@5 too low: $recall")
    // and every LSH result must be a genuine corpus neighbor, not noise
    assert(lsh.forall { case (q, n) => q < Similarity.NumQueries && n != q })
  }

  test("IVF ANN recall vs brute force on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val bf = Similarity.simBruteforceTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.simIvfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.2, s"IVF nprobe=3 recall@5 too low: $recall")
  }

  test("k-means IVF recall >= stand-in IVF recall (both vs brute force)") {
    // 50 queries, not the declared 5: recall@5 over 5 queries is 25 pairs,
    // where one flipped neighbor moves recall by 4 points — pure noise.
    val dir = "/root/testdata/sf0.01"
    val nq = 50
    val bf = Similarity.bruteforceTopkN(spark, dir, nq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopkN(spark, dir, nq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val km = Similarity.ivfKmeansTopkN(spark, dir, nq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rIvf = bf.intersect(ivf).size.toDouble / bf.size
    val rKm = bf.intersect(km).size.toDouble / bf.size
    assert(rKm >= rIvf, s"trained-centroid IVF recall $rKm < stand-in IVF recall $rIvf")
    assert(rKm >= 0.6, s"trained-centroid IVF recall@5 too low: $rKm")
  }

  test("PQ ADC recall vs exact dot product; codes are within the codebook") {
    // ground truth under the SAME metric ADC approximates (raw dot product,
    // not cosine): 4x16-dim codebooks of 16 codes quantize 64 dims to 4
    // codes, so the ranking floor is a property of the quantization error
    val dir = "/root/testdata/sf0.01"
    val nq = 50
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dot = expr(
      "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("va"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("vb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d_r").desc, col("n_id").asc)
    val exact = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("d_r", round(dot, 6))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= Similarity.K)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.pqAdcTopkN(spark, dir, nq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(adc).size.toDouble / exact.size
    // shortlist-free ADC recall is ~0.25 on this corpus (8x8 codebooks are
    // a 64x compression); the exact refine over the 100-deep shortlist is
    // what buys the rest — the production IVFADC+refine shape
    assert(recall >= 0.7, s"PQ ADC+refine recall@5 too low: $recall")
    // structural invariants: every vector encodes to one code per subspace,
    // every code addresses the 16-entry codebook
    val codes = Similarity.pqCodebooks(e)
    assert(codes.length == Similarity.PqSubspaces &&
      codes.forall(_.length == Similarity.PqCodes) &&
      codes.forall(_.forall(_.length == Similarity.PqSubDim)))
  }

  test("disk IVF-PQ: ADC+refine within probed lists matches the exact-dot-in-candidates reference") {
    // the composed operator's approximation error is ONLY the ADC+shortlist
    // step — the candidate set (probed lists) is identical by construction,
    // so the envelope is the in-memory PQ gate's, measured against exact
    // dots over the SAME candidates
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cos = graft.expr.functions.cosine_similarity(col("va"), col("vb"))
    val centroids = broadcast(e.filter(col("vec_id") < Similarity.NumCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("vb")))
    def assign(df: org.apache.spark.sql.DataFrame, idCol: String, keep: Int) = {
      val scored = df.crossJoin(centroids).withColumn("c_sim", round(cos, 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("c_sim").desc, col("cell_id").asc)
      scored.withColumn("crnk", row_number().over(w)).filter(col("crnk") <= keep)
        .select(col(idCol), col("va"), col("cell_id"))
    }
    val inv = assign(e.select(col("vec_id").as("n_id"), col("embedding").as("va")), "n_id", 1)
      .select(col("cell_id"), col("n_id"), col("va").as("vb"))
    val qp = assign(e.filter(col("vec_id") < Similarity.DiskQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("va")), "q_id", Similarity.NProbe)
    val dot = expr(
      "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d_r").desc, col("n_id").asc)
    val reference = broadcast(qp).join(inv, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("d_r", round(dot, 6))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= Similarity.K)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val disk = Similarity.simPqDisk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = reference.intersect(disk).size.toDouble / reference.size
    assert(recall >= 0.7, s"disk IVF-PQ recall@5 vs exact-in-candidates too low: $recall")
  }

  test("cluster-blocked embedding near-dup: found pairs exact, recall vs all-pairs") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    // ground truth: ALL pairs with cosine >= 0.35, no blocking at all
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("x"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("y"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", graft.expr.functions.cosine_similarity(col("x"), col("y")))
      .filter(col("cos") >= 0.35)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val found = TextDedup.ddEmbedKmeans(spark, dir)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // no false positives, and every reported cosine is the exact brute-force one
    found.foreach { case (pair, cos) =>
      assert(truth.get(pair).contains(cos), s"pair $pair cos mismatch or not a true near-dup")
    }
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.5, s"top-2-cluster blocking recall too low: $recall (${found.size}/${truth.size})")
  }

  test("int8-quantized vectors preserve brute-force ANN recall") {
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, v) => id -> v.map(_.toDouble) }
    // quantize + reconstruct with the operator's exact affine contract
    def roundtrip(v: Array[Double]): Array[Double] = {
      val mn = v.min; val mx = v.max
      val scale = if (mx > mn) (mx - mn) / 255.0 else 0.0
      v.map(x => mn + (if (scale > 0) math.floor((x - mn) / scale + 0.5) else 0.0) * scale)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def topk(corpus: Map[Long, Array[Double]], q: Long): Seq[Long] =
      corpus.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> cos(corpus(q), v) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    val full = vecs.toMap
    val recon = vecs.map { case (id, v) => id -> roundtrip(v) }.toMap
    val queries = vecs.take(50).map(_._1)
    val overlap = queries.map { q =>
      topk(full, q).toSet.intersect(topk(recon, q).toSet).size
    }.sum.toDouble / (queries.length * 5)
    assert(overlap >= 0.8, s"int8 roundtrip degraded top-5 recall to $overlap")
  }

  test("k-means centroids are invariant to input partitioning") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def dump(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      Similarity.kmeansCentroids(df).collect()
        .map(r => r.getLong(0) -> r.getAs[collection.Seq[Double]](1).toSeq).toMap
    val a = dump(e.coalesce(1))
    val b = dump(e.repartition(13))
    assert(a == b, "quantized-integer means must be bit-identical across partitionings")
  }

  test("RawPcm windowed energy: boundary windows mix segment amplitudes") {
    val p = Multimodal.RawPcm.encode(800, 3200, 2000, 1000, 0)
    val ws = Multimodal.RawPcm.windowStats(p, 100)
    assert(ws.length == 4)
    // window 2 straddles the amplitude split at sample 2000: 400 loud + 400 silent
    assert(ws(2) == ((2, 800, 400L * 1000 * 1000, 400, 1000)))
    // fully-silent tail window
    assert(ws(3) == ((3, 800, 0L, 800, 0)))
    // negative half-wave samples round-trip through the int16 encoding
    val loud = Multimodal.RawPcm.windowStats(
      Multimodal.RawPcm.encode(4, 4, 4, 32767, 0), 100)
    assert(loud == Seq((0, 4, 4L * 32767 * 32767, 0, 32767)))
  }

  test("stub decoder features are deterministic and correct") {
    val f = Multimodal.StubDecoder.decode("abc".getBytes("UTF-8"), "image/stub")
    assert(f.byteLen == 3 && f.byteSum == 97 + 98 + 99 && f.firstByte == 97)
    assert(f.nFrames == 1 && f.format == "stub/raw")
    val big = Multimodal.StubDecoder.decode(Array.fill[Byte](2500)(1), "image/stub")
    assert(big.nFrames == 2)
  }

  test("extractFeatures preserves row count and schema through mapPartitions") {
    val out = Multimodal.extractFeatures(spark, Multimodal.mediaTable(spark, "/root/testdata/sf0.001"))
    assert(out.count() == 500)
    assert(out.columns.toSeq == Seq("doc_id", "media_type", "byte_len", "byte_sum", "first_byte", "n_frames", "format"))
  }

  /** The engine-side replay of [[graft.ops.TextAnalysis.tcSampleMix]]'s
    * md5 coin, used to pick fixture ids on the wanted side of the rate. */
  private def mixCoin(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (hex(0).toInt * 256 + hex(1).toInt) % 100
  }

  test("corpus e2e ladder: every drop stage fires; offsets pack the final corpus") {
    import graft.ops.TextAnalysis
    // 30-word zh doc (rate 100 => mix never drops): marker 'shu' wins the
    // argmax, 'of and' lands the stopword ratio in the quality band
    def zh(seed: String, extra: Seq[String] = Nil): String =
      ("shu" +: "of" +: "and" +: ((1 to (27 - extra.size)).map(k => f"$seed$k%02dxx") ++ extra)).mkString(" ")
    def en(seed: String): String =
      ("the" +: "and" +: (1 to 28).map(k => f"$seed$k%02dxx")).mkString(" ")
    val enKeepId = (30L to 96L).find(i => mixCoin(i) < 50).get
    val enOutId = (30L to 96L).find(i => mixCoin(i) >= 50).get
    val evalText = zh("evalw")
    val contamText = // shares the eval doc's first 10 words (3 common 8-grams)
      (evalText.split(" ").take(10) ++ (1 to 20).map(k => f"contam$k%02d")).mkString(" ")
    val rows = Seq(
      (10L, zh("alpha"), "zh", "s1", 0L),                      // kept
      (12L, zh("gamma"), "zh", "s1", 0L),                      // kept (dup survivor)
      (13L, zh("gamma"), "zh", "s1", 0L),                      // exact_dup of 12
      (14L, "the and tiny", "en", "s1", 0L),                   // too_short (3 words)
      (15L, ("the" +: "and" +: (1 to 93).map(k => f"long$k%02dxx")).mkString(" "),
        "en", "s1", 0L),                                       // too_long (95 words)
      (16L, (1 to 30).map(k => f"magnificently$k%02d").mkString(" "),
        "en", "s1", 0L),                                       // low_quality (mwl>8, no stopwords)
      (17L, ("of" +: "and" +: (1 to 28).map(k => f"nolang$k%02d")).mkString(" "),
        "en", "s1", 0L),                                       // unknown_lang (stopwords, no markers)
      (18L, zh("delta"), "zh", "s1", 0L),                      // kept (near-dup survivor)
      (19L, zh("delta", Seq("zzz1", "zzz2", "zzz3")), "zh", "s1", 0L), // near_dup of 18
      (20L, contamText, "zh", "s1", 0L),                       // contaminated via doc 97
      (enKeepId, en("keep"), "en", "s1", 0L),                  // kept (coin < 50)
      (enOutId, en("mixout"), "en", "s1", 0L),                 // mix_sampled_out
      (97L, evalText, "zh", "ev", 0L))                         // eval_holdout (97 % 97 == 0)
    val dir = writeDocs(rows)
    val out = TextAnalysis.tcCorpusE2e(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def stage(id: Long): String = out(id).getString(2)
    assert(stage(13L) == "exact_dup" && stage(12L) == "")
    assert(stage(14L) == "too_short")
    assert(stage(15L) == "too_long")
    assert(stage(16L) == "low_quality")
    assert(stage(17L) == "unknown_lang")
    assert(stage(19L) == "near_dup" && stage(18L) == "")
    assert(stage(20L) == "contaminated")
    assert(stage(enOutId) == "mix_sampled_out")
    assert(stage(97L) == "eval_holdout")
    assert(stage(10L) == "" && stage(enKeepId) == "")
    // dropped docs carry NULL offsets; kept docs pack contiguously in
    // doc_id order (30 tokens each) and split sequences at SeqLen=64
    assert(out(19L).isNullAt(4) && out(97L).isNullAt(4))
    val kept = Seq(10L, 12L, 18L, enKeepId).sorted
    kept.zipWithIndex.foreach { case (id, i) =>
      assert(out(id).getLong(3) == 30L, s"n_tokens of $id")
      assert(out(id).getLong(4) == 30L * i, s"start_off of $id")
      assert(out(id).getLong(5) == (30L * i) / TextAnalysis.SeqLen, s"first_seq of $id")
      assert(out(id).getLong(6) == (30L * i + 29) / TextAnalysis.SeqLen, s"last_seq of $id")
    }
    // the data card attributes the SAME ladder: per-(lang, stage) doc counts
    // reconcile with the per-doc verdicts, and token mass covers drops too
    val card = TextAnalysis.tcDatacard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val wantCounts = out.values.groupBy { r =>
      val lang = rows.find(_._1 == r.getLong(0)).get._3
      (lang, if (r.getString(2) == "") "kept" else r.getString(2))
    }.view.mapValues(_.size.toLong).toMap
    assert(card.view.mapValues(_._1).toMap == wantCounts)
    assert(card(("zh", "kept"))._2 == 90L)          // 3 kept zh docs x 30 tokens
    assert(card(("en", "too_short"))._2 == 3L)      // dropped docs still weighed
  }
}
