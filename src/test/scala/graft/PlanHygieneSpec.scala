package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide plan-hygiene sweep: EVERY registered query's physical plan must
  * be free of cartesian products and nested-loop joins — the two operator
  * shapes that turn into scale-killers at 100 TB — except where the
  * nested-loop side is a documented driver-sized singleton (a broadcast
  * count/model row). Individual specs pin individual claims; this sweep
  * pins the NEXT regression: any new or edited query that plans a
  * cartesian/BNLJ against data-sized relations fails here by name before
  * it ever reaches a bench.
  *
  * Planning-only where possible (sparkPlan, no execution), but sink-family
  * query builders run their writes eagerly — sf0.001 keeps that cheap.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  /** The EXACT set of queries whose plan contains a nested-loop join — each
    * against a BROADCAST dim/model/fixture side, documented at its site.
    * Everything else, including every `_vol`/scale path, plans equi-joins:
    * j1_paris_vol* (cell-cover rewrite), j5_trigram_topk_vol (token
    * blocking), j7_radius* (cell join), sim_lsh/pq (bucketed/projected) are
    * all ABSENT here — this list is the measured evidence that the
    * fixture-scale theta forms and the volume-scale equi forms coexist as
    * designed. Tight by construction: a query added here without a
    * broadcast-singleton justification should be treated as a regression. */
  private val singletonNlj: Set[String] = Set(
    "j1_spatial_assign",          // 98-ring broadcast + ray-cast residual (fixture path)
    "j5_similarity_join", "j5_trigram_topk", // broadcast probe-set theta (vol form blocks)
    "j_contains_tokens",          // containment theta vs broadcast tiny side
    "mention_score_decayed", "mention_score_decision", "mention_score_decision_vol",
                                  // broadcast source catalog, suffix-match residual
    "p7_collections", "p7_collections_vol", "p7_collections_vol24", "seo_pages",
                                  // broadcast collection templates (~32 rows)
    "pipe_e2e_vol",               // composed: catalog + templates + count singletons
    "sim_bruteforce_topk",        // broadcast query set — the documented exact baseline
    "sim_ivf_topk",               // broadcast probe set + 16-centroid model
    "ann_ivf_disk",               // same 16-centroid broadcast model; the
                                  // corpus side is the stats-pruned scan
    "ann_pq_disk",                // same 16-centroid broadcast assignment;
                                  // ADC runs on codes from the pruned scan
    "tc_mix_budget",              // broadcast 1-row corpus total
    "tr_validation",              // broadcast poi fixture, contains() residual
    "ts_bm25_topk",               // broadcast 1-row (n_docs, avgdl) corpus stats
    "g_pagerank",                 // broadcast 1-row dangling-mass singleton, ×K iterations
    "ta_bigram_logprob",          // broadcast 1-row vocab-size singleton
    "sk_hll_intersect",           // broadcast 1-row estimator triple
    "q22_dormant_customers",      // broadcast 1-row balance-threshold stats
    "q15_top_supplier",           // broadcast 1-row max-revenue singleton
    "q11_important_parts")        // broadcast 1-row value-total singleton

  test("no query plans a cartesian/nested-loop join outside the singleton allowlist") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.sparkPlan
        val bad = plan.collect {
          case c: CartesianProductExec => c.getClass.getSimpleName
          case b: BroadcastNestedLoopJoinExec => b.getClass.getSimpleName
        }
        if (bad.nonEmpty && !singletonNlj.contains(name)) Some(s"$name: ${bad.mkString(",")}")
        else None
      } catch {
        case e: Throwable => Some(s"$name: PLANNING FAILED ${e.getClass.getSimpleName}")
      }
    }
    assert(violations.isEmpty,
      s"scale-killer operators found:\n  ${violations.mkString("\n  ")}")
  }

  test("sim_ivf_topk's centroid cross join is EXPLICITLY broadcast, build side = centroids") {
    // r17 advisory: the assignment crossJoin must not ride the autoBroadcast
    // threshold — the hint is pinned at the join site, so the plan keeps the
    // centroid (right) side as the broadcast build side under any
    // spark.sql.autoBroadcastJoinThreshold, including -1
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val plan = SparkEntry.queries("sim_ivf_topk")(spark, sf).queryExecution.sparkPlan
    val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.nonEmpty, "expected the centroid-assignment BNLJ in the plan")
    assert(bnlj.forall(_.buildSide == BuildRight),
      s"centroid side must be the broadcast build side: ${bnlj.map(_.buildSide)}")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pinned = SparkEntry.queries("sim_ivf_topk")(spark, sf)
        .queryExecution.sparkPlan
        .collect { case b: BroadcastNestedLoopJoinExec => b }
      assert(pinned.nonEmpty && pinned.forall(_.buildSide == BuildRight),
        "broadcast hint must survive autoBroadcastJoinThreshold=-1")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
