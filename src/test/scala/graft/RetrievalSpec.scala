package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** Pins the BM25 dataflow against an independent pure-Scala computation of
  * the same formula over the raw corpus (no Spark expressions involved), so
  * a drift in the join/pruning plumbing can't hide behind the shared
  * formula string that the DuckDB oracle replays. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private lazy val corpus: Map[Long, Seq[String]] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").toSeq.filter(_.nonEmpty)).toMap
  }

  /** Reference BM25: same constants, same +1-smoothed idf, quantized the
    * same way, computed with plain Scala collections. */
  private def refScores(qterms: Seq[String]): Map[Long, Long] = {
    val n = corpus.size
    val avgdl = corpus.values.map(_.size.toLong).sum.toDouble / n
    val dfreq = qterms.distinct.map { t =>
      t -> corpus.count { case (_, ws) => ws.contains(t) }
    }.toMap
    corpus.flatMap { case (doc, ws) =>
      val dl = ws.size
      val contribs = qterms.flatMap { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log((n.toDouble - dfreq(t) + 0.5) / (dfreq(t) + 0.5) + 1.0)
          val c = idf * (tf.toDouble * (Retrieval.K1 + 1)) /
            (tf.toDouble + Retrieval.K1 *
              (1 - Retrieval.B + Retrieval.B * dl.toDouble / avgdl))
          Some(math.round(c * Retrieval.Scale))
        }
      }
      if (contribs.isEmpty) None else Some(doc -> contribs.sum)
    }
  }

  test("engine top-k matches the pure-Scala BM25 reference, every query") {
    val got = Retrieval.tsBm25Topk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == Retrieval.queryFixture.size * Retrieval.TopK)
    Retrieval.queryFixture.foreach { case (qid, qtext) =>
      val want = refScores(qtext.split(" ").toSeq).toSeq
        .sortBy { case (doc, s) => (-s, doc) }.take(Retrieval.TopK)
        .zipWithIndex.map { case ((doc, s), i) => (qid, doc, s, (i + 1).toLong) }
      val have = got.filter(_._1 == qid).sortBy(_._4).toSeq
      assert(have == want, s"query $qid diverges from reference")
    }
  }

  test("an out-of-vocabulary term drops out instead of poisoning the score") {
    // query 4 is 'zanzibar merge'; its scores must equal 'merge' alone
    val mergeOnly = refScores(Seq("merge")).toSeq
      .sortBy { case (doc, s) => (-s, doc) }.take(Retrieval.TopK).toMap
    val q4 = Retrieval.tsBm25Topk(spark, sf).collect()
      .filter(_.getLong(0) == 4L).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(q4 == mergeOnly)
  }
}
