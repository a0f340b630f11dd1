package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ranked text retrieval over the document corpus — the search-shaped read
  * path a training-data pipeline needs beside its dedup/quality writes
  * (find exemplars, audit near-matches of a probe phrase, build eval
  * slices by relevance). BM25 (Robertson/Spärck Jones; the Lucene
  * `k1`/`b` parametrization with the +1-smoothed idf so scores stay
  * positive) over an inverted-posting dataflow:
  *
  *   - tokenize once; postings are `(doc_id, term, tf)` — an ordinary
  *     groupBy, map-side partial;
  *   - the query term set PRUNES the postings FIRST (broadcast semi
  *     join), so only query-relevant postings flow into scoring — at
  *     100 TB the scored slice is proportional to the hit set, not the
  *     corpus, which is what makes ad-hoc probes affordable;
  *   - document-frequency and the corpus stats (N, avgdl) are
  *     sketch-sized → explicit `broadcast`; the only data-sized join is
  *     postings⋈doclen on doc_id (SMJ at scale, BHJ at test SF);
  *   - top-k per query is a bounded window (rank ≤ K on the scored
  *     per-query slice).
  *
  * Cross-engine exactness: every per-term contribution is computed by the
  * SAME SQL string in both engines (Spark `expr` and the DuckDB oracle
  * share the formula text, doubles interpolated once from the Scala
  * constants), then quantized to a BIGINT at 1e9 — the per-(query,doc)
  * score is an ORDER-INDEPENDENT integer sum, so shuffle/merge order can
  * never move the hash. `ln` agreeing bitwise across libm's is the same
  * dependency the HLL estimator already carries.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75
  val TopK = 10
  val Scale = 1e9

  /** Probe queries, chosen to hit the synthetic corpus vocabulary with
    * different selectivities (plus one absent term: it contributes no
    * postings, so it must drop out of scoring naturally). */
  val queryFixture: Seq[(Long, String)] = Seq(
    (1L, "hash join"),
    (2L, "stream batch window"),
    (3L, "filter scan column vector"),
    (4L, "zanzibar merge"))

  /** The shared scalar formula: per-term BM25 contribution quantized to a
    * BIGINT. One string, both engines — `n_docs`, `dfreq`, `tf`, `dl`,
    * `avgdl` are column references in scope at the point of use. */
  private val cq9Sql: String = {
    val idf = "ln((CAST(n_docs AS DOUBLE) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)"
    s"CAST(round($idf * (CAST(tf AS DOUBLE) * ${K1 + 1}) / " +
      s"(CAST(tf AS DOUBLE) + $K1 * (${1 - B} + $B * CAST(dl AS DOUBLE) / avgdl)) " +
      s"* $Scale) AS BIGINT)"
  }

  def tsBm25Topk(spark: SparkSession, dir: String): DataFrame = {
    // fanned: the token explosion feeds two separate groupBys (doclen,
    // postings) and otherwise runs twice on the single scan task (§2.5)
    val toks = graft.Tables.documentsFanned(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val doclen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = spark.createDataFrame(queryFixture).toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val postings = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
    val dfreq = postings.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("dfreq"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .join(doclen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("c_q9", expr(cq9Sql))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_q9")).as("score_q9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q9").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("doc_id"), col("score_q9"),
        col("rnk").cast("long").as("rnk"))
  }

  private val bm25Sql: String = {
    val qValues = queryFixture
      .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS term
       |  FROM documents),
       |tk AS (SELECT doc_id, term FROM toks WHERE len(term) > 0),
       |doclen AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |  FROM doclen),
       |q(query_id, qtext) AS (VALUES $qValues),
       |qt AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id,
       |    unnest(string_split(qtext, ' ')) AS term
       |  FROM q),
       |postings AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tk
       |  WHERE term IN (SELECT DISTINCT term FROM qt)
       |  GROUP BY doc_id, term),
       |dfreq AS (
       |  SELECT term, count(DISTINCT doc_id) AS dfreq FROM postings GROUP BY term),
       |scored AS (
       |  SELECT qt.query_id, p.doc_id, CAST(sum($cq9Sql) AS BIGINT) AS score_q9
       |  FROM postings p
       |  JOIN dfreq USING (term)
       |  JOIN doclen USING (doc_id)
       |  CROSS JOIN stats
       |  JOIN qt USING (term)
       |  GROUP BY qt.query_id, p.doc_id)
       |SELECT query_id, doc_id, score_q9, rnk FROM (
       |  SELECT query_id, doc_id, score_q9,
       |    CAST(row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_q9 DESC, doc_id) AS BIGINT) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TopK""".stripMargin
  }

  val queries: Map[String, Relational.Q] = Map(
    "ts_bm25_topk" -> (tsBm25Topk _))

  val oracles: Map[String, String] = Map(
    "ts_bm25_topk" -> bm25Sql)
}
