package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale behavior of the duplicate-cluster canonicalization that the DuckDB
  * hash oracle can't pin on its own (VERDICT r9 item 1):
  *
  *  - the hop+jump loop's round count must track ~log₂(diameter), not the
  *    diameter itself — the property that keeps connected components alive
  *    at 100 TB where a long-chain component would otherwise mean one full
  *    shuffle round per hop, and
  *  - per-round candidate mass must stay O(edges) even through 100-leaf
  *    stars (no per-star quadratic blow-up).
  */
class DedupClusterVolSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("planted chains+stars: log-bounded rounds, O(edges) hop mass, exact labels") {
    val pairs = TextDedup.plantedClusterEdges(spark)
    val nEdges = pairs.count()
    assert(nEdges ==
      TextDedup.ClustVolChains * (TextDedup.ClustVolChainLen - 1) +
      TextDedup.ClustVolStars * (TextDedup.ClustVolStarSize - 1))

    val (labels, rounds) = TextDedup.minLabelConverge(pairs)

    // ≥50k docs, planted diameter 59 (well past the ≥6 floor)
    val nNodes = labels.count()
    assert(nNodes == 60000L, s"nNodes=$nNodes")

    // labels stay unique per id through the loop — the invariant that makes
    // the hop join emit exactly |edges| rows every round
    assert(labels.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)

    // round count: scrambled chains put the component min 51 hops from the
    // far end, so static-edge label propagation needs ~52 rounds; the
    // star-contraction loop must stay within ⌈log₂(59)⌉ + slack.
    // (Deterministic graph — the measured count is stable; the bound leaves
    // headroom, not noise.)
    assert(rounds >= 2 && rounds <= 10, s"rounds=$rounds (diameter 59)")
    info(s"star-contraction rounds: $rounds (diameter 59, ⌈log₂⌉ = 6)")

    // exact canonicalization: every chain node → its chain's offset-0 id,
    // every star node → its hub
    val base = TextDedup.ClustVolStarBase
    val wrong = labels.filter(
      when(col("id") < base,
        col("comp") =!= expr(s"(id DIV ${TextDedup.ClustVolChainLen}) * ${TextDedup.ClustVolChainLen}"))
        .otherwise(
          col("comp") =!= expr(s"$base + ((id - $base) DIV ${TextDedup.ClustVolStarSize}) * ${TextDedup.ClustVolStarSize}")))
      .count()
    assert(wrong == 0, s"$wrong nodes canonicalized wrongly")

    // per-round pair mass: a large-star pass emits ≤ |E| canonical rows
    // (each undirected edge contributes exactly one, from its smaller
    // endpoint's view) and a small-star pass ≤ |E| + |V| — O(edges) every
    // round, independent of star width (no per-star quadratic expansion)
    val c0 = TextDedup.canonPairs(pairs.toDF("src", "dst"))
    val nCanon = c0.count()
    val l1 = TextDedup.largeStar(c0)
    val nL1 = l1.count()
    assert(nL1 <= nCanon, s"large-star mass $nL1 > $nCanon")
    val s1 = TextDedup.smallStar(l1)
    val nS1 = s1.count()
    assert(nS1 <= nL1 + nNodes, s"small-star mass $nS1 > ${nL1 + nNodes}")
  }
}
