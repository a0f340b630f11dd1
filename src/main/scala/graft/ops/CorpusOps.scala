package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between curation and tokenization (driver mandate, companions to the
  * `tc_*` family in [[TextAnalysis]]): corpus-wide exact span dedup, the
  * deterministic global shuffle into training shards, and the leakage-safe
  * group-level train/val/test split.
  *
  * Scale notes (100 TB north star): span dedup shuffles ONLY on the chunk
  * hash (uniform by construction; the owner join is 1×N on that same key —
  * no row explosion, AQE-splittable if a boilerplate span goes hot); the
  * shard shuffle's per-shard sort is bounded by |corpus|/shards with shard
  * count chosen ∝ corpus size (this IS the write-sorted-shard shape:
  * repartition on shard + sort within partition); the split is a pure
  * projection — no shuffle at all, and group-hashing (not row-hashing) is
  * what keeps all documents of a source out of more than one split.
  */
object CorpusOps {

  /** Corpus-wide EXACT SPAN DEDUP (the RefinedWeb/Dolma exact-substring
    * dedup move, over [[TextAnalysis.tcChunk]]'s overlapping word windows):
    * an occurrence of a repeated span is removed unless it is the GLOBAL
    * first occurrence of its hash (min (doc_id, chunk_idx) — deterministic,
    * order-independent). Per document the declared output is the removal
    * accounting a curation run keeps: chunk count, removed count, kept
    * fraction. The owner is a map-side-combinable `min(struct)` per hash —
    * never a window over the occurrence relation — so the only shuffles are
    * the hash aggregate and the 1×N owner join back. */
  def tcSpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val ch = TextAnalysis.tcChunk(spark, dir)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"))
    val owners = ch.groupBy(col("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("own"))
    val marked = ch.join(owners, Seq("chunk_hash"))
      .withColumn("removed",
        !(col("doc_id") === col("own.doc_id") &&
          col("chunk_idx") === col("own.chunk_idx")))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("removed").cast("long")).as("n_removed"))
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        round(lit(1.0) - col("n_removed").cast("double") / col("n_chunks"), 6)
          .as("keep_frac"))
  }

  val NumShards = 8

  /** Deterministic GLOBAL SHUFFLE into training shards — the
    * order-randomization step before sequence packing: every document gets a
    * content-independent shuffle key (md5 of its id — reproducible run to
    * run, decorrelated from ingest order, survives repartitioning; same coin
    * contract as tc_sample_mix), its shard is the key mod [[NumShards]], and
    * its position is the rank of its key within the shard. The per-shard
    * rank window is the declared form of `repartition(shard) +
    * sortWithinPartitions(key)` — the physical shard write — and its
    * partition size is bounded by |corpus|/shards (shard count scales with
    * the corpus, so no partition ever exceeds a shard). */
  def tcShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val hex = md5(col("doc_id").cast("string").cast("binary"))
    val keyed = Tables.documents(spark, dir).select(
      col("doc_id"),
      hex.as("shuffle_key"),
      ((ascii(substring(hex, 1, 1)) * 256 + ascii(substring(hex, 2, 1)))
        % NumShards).cast("long").as("shard"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val TrainPct = 80
  val ValPct = 10 // val = [TrainPct, TrainPct + ValPct), test = the rest

  /** Leakage-safe TRAIN/VAL/TEST SPLIT at the SOURCE level: the coin is
    * hashed from the document's source, not the document — every document of
    * a source lands in the same split by construction, which is what keeps
    * near-duplicate documents from one site from straddling the train/eval
    * boundary (row-level splitting leaks). Pure projection: no shuffle, no
    * state; the split of a 100 TB corpus is decided at scan speed. */
  def tcDomainSplit(spark: SparkSession, dir: String): DataFrame = {
    val hex = md5(col("source").cast("binary"))
    val coin = (ascii(substring(hex, 1, 1)) * 256 + ascii(substring(hex, 2, 1))) % 100
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      coin.cast("long").as("coin"),
      when(coin < TrainPct, "train")
        .when(coin < TrainPct + ValPct, "val")
        .otherwise("test").as("split"))
  }

  /** Sample size per language for [[tcWeightedSample]]. */
  val SampleK = 12
  private val HexDigits = "0123456789abcdef"
  /** 52-bit integer from the first 13 hex digits of `h` (Horner form,
    * BIGINT seed — digit builtins return 32-bit INT in both dialects and
    * the ×16 chain must widen in 64-bit). Parameterized only by the
    * substring-search builtin's argument order (Spark locate(sub, str) vs
    * DuckDB strpos(str, sub)) — the Sketches convention. */
  private def m52Sql(h: String, hexVal: (String, Int) => String): String =
    (2 to 13).foldLeft(s"CAST(${hexVal(h, 1)} AS BIGINT)") {
      (acc, i) => s"(($acc) * 16 + ${hexVal(h, i)})"
    }
  /** 2^52 as a double literal — the uniform-coin denominator. */
  private val TwoPow52 = "4503599627370496.0"

  /** WEIGHTED SAMPLING WITHOUT REPLACEMENT per group — the
    * Efraimidis–Spirakis one-pass scheme that decides a training MIXTURE
    * ("k documents per language, longer documents proportionally more
    * likely") without ever materializing the k draws sequentially: each row
    * gets an exponential key `-ln(u)/w` from a DETERMINISTIC uniform coin
    * (md5 of the doc id → 52-bit integer → u ∈ (0,1), same reproducible-coin
    * contract as [[tcShuffleShards]]) and the k smallest keys per group ARE
    * a weight-proportional sample without replacement (Efraimidis &
    * Spirakis 2006, via the equivalent u^(1/w) max-form). Scale shape: a
    * rank-k window, which Spark plans with WindowGroupLimit — every map
    * task pre-truncates to its local top-k per group BEFORE the shuffle, so
    * the exchange carries O(k · groups · tasks) rows, not the corpus; at
    * 100 TB the sample of a petabyte mixture costs one scan plus a
    * k-bounded shuffle. The emitted columns are rank and identity only —
    * the float key stays internal to the ORDER (cross-engine ln agrees to
    * ~1 ulp; a rank flip would need two keys within that of each other,
    * checked by the cross-SF sweep) with doc_id as the total-order tiebreak. */
  def tcWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val hv: (String, Int) => String =
      (h, i) => s"(locate(substring($h, $i, 1), '$HexDigits') - 1)"
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .withColumn("h", expr("md5(cast(cast(doc_id as string) as binary))"))
      .withColumn("m", expr(m52Sql("h", hv)))
      .withColumn("es_key", expr(s"-ln((m + 0.5) / $TwoPow52) / n_chars"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("es_key").asc, col("doc_id").asc)))
      .filter(col("rank") <= SampleK)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_chars").as("weight"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "tc_span_dedup" -> (tcSpanDedup _),
    "tc_shuffle_shards" -> (tcShuffleShards _),
    "tc_weighted_sample" -> (tcWeightedSample _),
    "tc_domain_split" -> (tcDomainSplit _))

  val oracles: Map[String, String] = Map(
    "tc_weighted_sample" -> {
      val hv: (String, Int) => String =
        (h, i) => s"(strpos('$HexDigits', substring($h, $i, 1)) - 1)"
      s"""WITH keyed AS (
         |  SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents WHERE n_chars > 0),
         |coined AS (
         |  SELECT doc_id, lang, n_chars, ${m52Sql("h", hv)} AS m FROM keyed),
         |ranked AS (
         |  SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY -ln((m + 0.5) / $TwoPow52) / n_chars ASC, doc_id ASC)
         |      AS rank
         |  FROM coined)
         |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
         |  n_chars AS weight
         |FROM ranked WHERE rank <= $SampleK""".stripMargin
    },
    // owner replay: rank within hash (window) == the engine's min(struct)
    "tc_span_dedup" ->
      s"""WITH ${TextAnalysis.chunkCtesSql},
         |r AS (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY chunk_hash
         |      ORDER BY doc_id, chunk_idx) AS rn
         |  FROM ch)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(round(1.0 - sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         |    AS DOUBLE) AS keep_frac
         |FROM r GROUP BY doc_id""".stripMargin,
    "tc_shuffle_shards" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
         |    (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
         |      + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % $NumShards AS shard
         |  FROM documents)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
         |FROM keyed""".stripMargin,
    "tc_domain_split" ->
      s"""SELECT doc_id, source,
         |  CAST((ascii(substring(md5(source), 1, 1)) * 256
         |    + ascii(substring(md5(source), 2, 1))) % 100 AS BIGINT) AS coin,
         |  CASE WHEN (ascii(substring(md5(source), 1, 1)) * 256
         |      + ascii(substring(md5(source), 2, 1))) % 100 < $TrainPct THEN 'train'
         |    WHEN (ascii(substring(md5(source), 1, 1)) * 256
         |      + ascii(substring(md5(source), 2, 1))) % 100 < ${TrainPct + ValPct} THEN 'val'
         |    ELSE 'test' END AS split
         |FROM documents""".stripMargin)
}
