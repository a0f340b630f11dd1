package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.domain.{Fixtures, MentionDedup, MentionScoring, Spatial}
import graft.expr.TextAlgo

/** Domain-operator invariants that the driver's oracle can't see. */
class DomainOpsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("dedup fixture keys match the dedupe_key expression (no drift)") {
    MentionDedup.dedupCandidates.foreach { case (_, _, url, key, _, _, _, _, _) =>
      assert(TextAlgo.dedupeKey(url) == key, s"for $url")
    }
  }

  test("W3 keeps at most 2 per (source, key), best score first") {
    val out = MentionDedup.qW3Dedup(spark, "").collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    // group lefooding/le-rigmarole: d3 (0.855) > d1 (0.81) > d2 (0.63, dropped)
    assert(out("d3") == 1L && out("d1") == 2L && !out.contains("d2"))
    // timeout pair dedupes to one key, tie on score → ord wins
    assert(out("d5") == 1L && out("d6") == 2L)
  }

  test("W4 drops same-domain same-normalized-url duplicates") {
    val kept = MentionDedup.qW4InBatch(spark, "").collect().map(_.getString(0)).toSet
    // d5/d6 normalized urls differ → both kept; duplicates collapse via W3 only
    assert(kept.contains("d1") && kept.contains("d5") && kept.contains("d6"))
  }

  test("J1 assignment: nested smallest-area wins, outside POI gets nulls") {
    val rows = Spatial.qSpatialAssign(spark, "").collect()
      .map(r => r.getString(0) -> (Option(r.getString(3)), Option(r.getString(4)))).toMap
    assert(rows("sp1") == (Some("2e Arrondissement"), Some("Quartier Mail")))
    assert(rows("sp2") == (Some("1er Arrondissement"), None))
    assert(rows("sp3") == (Some("2e Arrondissement"), Some("Quartier Halles")))
    assert(rows("sp4") == (None, None))
  }

  test("J2 press-lowest fallback when no unknown-type source exists") {
    // resolveAuthority falls back to unknown-type first (mysteryfr present);
    // verify the press-lowest path directly on the resolved catalog
    val noUnknown = MentionScoring.resolvedCatalog.filterNot(_._4 == "unknown")
    val lowestPress = noUnknown.filter(_._4.toLowerCase == "press")
      .sortBy(c => (c._5, c._1)).head
    assert(lowestPress._2 == "sortiraparis") // 0.7 < timeout 0.8
  }

  test("decision table covers all branches on the fixture") {
    val out = MentionScoring.qMentionScoreDecision(spark, "").collect()
      .map(r => r.getString(0) -> (r.getString(9), r.getString(10))).toMap
    assert(out("c1") == ("ACCEPT", "score_high"))
    assert(out("c2") == ("ACCEPT", "confirmed_domain"))
    assert(out("c3") == ("REJECT", ""))
    assert(out("c4") == ("REVIEW", "mid_conditional"))
    assert(out("c5") == ("REJECT", ""))
    assert(out("c6") == ("REJECT", ""))
    assert(!out.contains("c10"), "excluded domain must be filtered before scoring")
  }

  test("classifier personas: badge branches") {
    val rows = domain.Classify.qClassifyScores(spark, "").collect()
      .map(r => r.getString(0) -> r.getAs[String]("badges")).toMap
    assert(rows("p1") == "new,trending,hidden_gem")
    assert(rows("p4") == "hidden_gem,local_favorite")
    assert(rows("p3") == "")
  }
}
