package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Sessions

/** Pins WHY dd_containment exists beside dd_ngram_jaccard: on this corpus
  * the blocked Jaccard pass surfaces 1 pair, the unblocked containment
  * pass surfaces 25 — and every extra pair crosses a (lang, source)
  * block boundary, i.e. exactly the quote-across-sources class the
  * blocked symmetric pass structurally cannot see. Also re-derives every
  * reported ratio from an independent Scala shingle computation. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private def shingles(text: String): Set[String] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    if (ws.length < 3) Set.empty
    else ws.sliding(3).map(_.mkString(" ")).toSet
  }

  test("containment pairs: exact ratios, strict supersets exist, extras cross blocks") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), shingles(r.getString(3)))))
      .toMap
    val pairs = TextDedup.ddContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, nInter, nA, nB, cQ6) =>
      val (sa, sb) = (docs(a)._3, docs(b)._3)
      assert(nA == sa.size && nB == sb.size && nInter == sa.intersect(sb).size,
        s"pair ($a,$b): sizes diverge from the independent shingle sets")
      assert(cQ6 == nInter * 1000000L / math.min(nA, nB) && cQ6 >= 800000L)
    }
    val jaccardPairs = TextDedup.ddNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSet
    val containPairs = pairs.map(p => (p._1, p._2)).toSet
    val extras = containPairs -- jaccardPairs
    assert(extras.nonEmpty, "containment must surface pairs the blocked pass misses")
    extras.foreach { case (a, b) =>
      assert(docs(a)._1 != docs(b)._1 || docs(a)._2 != docs(b)._2,
        s"extra pair ($a,$b) does not cross a block boundary — the unblocked " +
          "join is not what found it")
    }
  }
}
