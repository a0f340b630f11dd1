package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** 10×-beyond-the-bench volume proof for the round's slowest families
  * (VERDICT r13 item 3). The bench tops out at sf0.1; these tests drive the
  * same dataflows on ~10× that volume (replicated corpus/graph — testdata
  * itself is read-only) and pin the two things that matter at 100 TB:
  *
  *  1. PLAN SHAPE is volume-invariant: same number of exchanges, no
  *     nested-loop/cartesian join appearing at the larger scale (a plan
  *     that degrades with volume fails here before it fails a cluster);
  *  2. WALL TIME grows ≲ linearly (ratio-bounded; only asserted under
  *     GRAFT_TIMING_ASSERTS on an idle box, per the bench protocol).
  *
  * The timing bound is deliberately loose (15× for 10× data) — it catches
  * quadratic blow-ups, not constant factors; constant factors are the
  * bench's job.
  */
class ScaleProofSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(8)

  private def timeAndPlan(df: DataFrame): (Double, String) = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    (secs, df.queryExecution.executedPlan.toString)
  }

  private def exchanges(plan: String): Int =
    "(?m)^\\s*[+:]?-?\\s*\\*?\\(?\\d*\\)?\\s*Exchange ".r.findAllIn(plan).size max
      "Exchange ".r.findAllIn(plan).size

  private def assertShape(base: String, big: String, label: String): Unit = {
    // comparative, not absolute: a deliberate broadcast cross-join of a
    // 1-row aggregate (pipe_e2e's ride-along counts) is fine — what must
    // NOT happen is a NEW nested-loop/cartesian appearing only at volume
    def nlj(p: String) = "BroadcastNestedLoopJoin".r.findAllIn(p).size +
      "CartesianProduct".r.findAllIn(p).size
    assert(nlj(big) <= nlj(base),
      s"$label grew nested-loop/cartesian joins at 10x: ${nlj(base)} -> ${nlj(big)}")
    val (eb, ebig) = (exchanges(base), exchanges(big))
    assert(ebig <= eb, s"$label plan gained exchanges at 10x: $eb -> $ebig")
  }

  private def assertLinear(tBase: Double, tBig: Double, label: String): Unit =
    if (sys.env.contains("GRAFT_TIMING_ASSERTS"))
      assert(tBig <= 15.0 * math.max(tBase, 0.2),
        f"$label: $tBase%.2f s -> $tBig%.2f s at 10x volume (superlinear)")

  val Sf01 = "/root/testdata/sf0.1"
  val Sf001 = "/root/testdata/sf0.01"

  test("dd_ngram_jaccard_dfcap at 10x sf0.1: df-cap keeps the join linear") {
    val docs = graft.Tables.documents(spark, Sf01)
    val (tb, pb) = timeAndPlan(TextDedup.dfcapPairsOf(TextDedup.shingleRowsOf(docs)))
    val rep = TextDedup.replicateNearDup(docs) // 10x near-dup corpus
    val (tr, pr) = timeAndPlan(TextDedup.dfcapPairsOf(TextDedup.shingleRowsOf(rep)))
    assertShape(pb, pr, "dfcap")
    assertLinear(tb, tr, "dfcap")
  }

  test("dup clusters at 10x planted volume: 600k nodes, rounds stay logarithmic") {
    val base = TextDedup.plantedClusterEdges(spark)
    val (tb, pb) = timeAndPlan(TextDedup.canonicalClusters(base))
    // 10 disconnected copies of the planted topology, ids offset per copy —
    // component structure per copy identical, total mass 10x
    val offset = 1000000L
    val big = base.withColumn("rep", explode(sequence(lit(0), lit(9))))
      .select((col("id_a") + col("rep") * offset).as("id_a"),
        (col("id_b") + col("rep") * offset).as("id_b"))
    val (tr, pr) = timeAndPlan(TextDedup.canonicalClusters(big))
    // the iterative loop localCheckpoints each round: executed plans are
    // per-round, so only the no-NLJ invariant is comparable here
    assert(!pr.contains("BroadcastNestedLoopJoin") && !pr.contains("CartesianProduct"))
    assert(!pb.contains("BroadcastNestedLoopJoin"))
    assertLinear(tb, tr, "dup_clusters")
  }

  test("pagerank at 10x the sf0.1 graph: per-iteration mass scales linearly") {
    val e = Graph.edges(spark, Sf01)
    val (tb, pb) = timeAndPlan(Graph.pagerankOn(spark, e))
    val (tr, pr) = timeAndPlan(Graph.pagerankOn(spark, replicate10(e)))
    assert(!pr.contains("BroadcastNestedLoopJoin") && !pr.contains("CartesianProduct"))
    assert(!pb.contains("BroadcastNestedLoopJoin"))
    assertLinear(tb, tr, "pagerank")
  }

  test("pipe_e2e_vol slope sf0.01 -> sf0.1: the composed pipeline is linear in its input") {
    val (tb, pb) = timeAndPlan(graft.domain.PipelineVol.qPipeE2eVol(spark, Sf001))
    val (tr, pr) = timeAndPlan(graft.domain.PipelineVol.qPipeE2eVol(spark, Sf01))
    assertShape(pb, pr, "pipe_e2e")
    assertLinear(tb, tr, "pipe_e2e")
  }

  test("tc_corpus_e2e slope sf0.01 -> sf0.1: the composed curation run is linear in its corpus") {
    val (tb, pb) = timeAndPlan(TextAnalysis.tcCorpusE2e(spark, Sf001))
    val (tr, pr) = timeAndPlan(TextAnalysis.tcCorpusE2e(spark, Sf01))
    assertShape(pb, pr, "tc_corpus_e2e")
    assertLinear(tb, tr, "tc_corpus_e2e")
  }

  /** 10 disconnected id-offset copies of an edge relation — component
    * structure per copy identical, total mass 10× (the pagerank test's
    * replication, shared). */
  private def replicate10(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val offset = 10000000L
    e.withColumn("rep", explode(sequence(lit(0), lit(9))))
      .select((col("src") + col("rep") * offset).as("src"),
        (col("dst") + col("rep") * offset).as("dst"), col("w"))
  }

  test("triangles at 10x the sf0.1 graph: wedge mass scales linearly") {
    val e = Graph.edges(spark, Sf01)
    val (tb, pb) = timeAndPlan(Graph.trianglesOn(spark, e))
    val (tr, pr) = timeAndPlan(Graph.trianglesOn(spark, replicate10(e)))
    assert(!pr.contains("CartesianProduct") && !pb.contains("CartesianProduct"))
    // checkpointed base truncates lineage, so compare NLJ absence, not counts
    assert(!pr.contains("BroadcastNestedLoopJoin"))
    assertLinear(tb, tr, "triangles")
  }

  test("k-hop reach at 10x the sf0.1 graph: per-hop mass scales linearly") {
    val e = Graph.edges(spark, Sf01)
    val (tb, pb) = timeAndPlan(Graph.khopOn(spark, e))
    val (tr, pr) = timeAndPlan(Graph.khopOn(spark, replicate10(e)))
    assert(!pr.contains("CartesianProduct") && !pb.contains("CartesianProduct"))
    assert(!pr.contains("BroadcastNestedLoopJoin"))
    assertLinear(tb, tr, "khop")
  }
}
