package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

/** Behavioral specs for the corpus-preparation operators (span dedup, shard
  * shuffle, leakage-safe split) — invariants the hash oracle can't state. */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)
  val dir = "/root/testdata/sf0.01"

  test("span dedup: exactly one occurrence of every distinct span survives") {
    val ch = ops.TextAnalysis.tcChunk(spark, dir)
      .select("doc_id", "chunk_idx", "chunk_hash")
    val nOcc = ch.count()
    val nDistinct = ch.select("chunk_hash").distinct().count()
    val agg = CorpusOps.tcSpanDedup(spark, dir)
      .agg(sum("n_chunks").as("c"), sum("n_removed").as("r")).collect()(0)
    assert(agg.getLong(0) == nOcc, "chunk accounting must cover every occurrence")
    // kept = occurrences - removed = exactly the distinct span set
    assert(agg.getLong(0) - agg.getLong(1) == nDistinct,
      s"kept ${agg.getLong(0) - agg.getLong(1)} != distinct spans $nDistinct")
    // the corpus genuinely contains cross-document repeats (else this op
    // demonstrates nothing at this SF)
    assert(agg.getLong(1) > 0, "fixture must contain repeated spans")
  }

  test("span dedup: the kept occurrence is the global (doc_id, chunk_idx) min") {
    val ch = ops.TextAnalysis.tcChunk(spark, dir)
      .select("doc_id", "chunk_idx", "chunk_hash")
    // brute-force owners via a window, compare per-doc removal counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_idx"))
    val expected = ch.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = CorpusOps.tcSpanDedup(spark, dir)
      .select("doc_id", "n_removed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("shard shuffle: shards partition the corpus, positions are dense ranks") {
    val s = CorpusOps.tcShuffleShards(spark, dir).collect()
    val n = Tables.documents(spark, dir).count()
    assert(s.length == n, "every document gets exactly one shard slot")
    assert(s.map(_.getLong(1)).toSet.subsetOf((0L until CorpusOps.NumShards).toSet))
    // per shard: positions are exactly 1..size (dense, no gaps/dups)
    s.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(2)).sorted
      assert(pos.toSeq == (1L to rows.length).toSeq, s"shard $shard ranks not dense")
    }
    // determinism: a second run (fresh plan) produces the identical order
    val again = CorpusOps.tcShuffleShards(spark, dir).collect()
    assert(s.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("shard shuffle decorrelates from id order (not a modulo striping)") {
    val s = CorpusOps.tcShuffleShards(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // if the shard were doc_id % NumShards the match rate would be 100%
    val striped = s.count { case (id, shard) => shard == id % CorpusOps.NumShards }
    assert(striped < s.size / 2, s"shard assignment looks like id striping ($striped/${s.size})")
  }

  test("domain split: every source lands in exactly one split; all splits used") {
    val rows = CorpusOps.tcDomainSplit(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(1))
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getString(3)).toSet.size == 1,
        s"source $src straddles splits — leakage")
    }
    val splits = rows.map(_.getString(3)).toSet
    assert(splits == Set("train", "val", "test"),
      s"fixture must exercise all three splits, got $splits")
    // train is the majority slice
    val counts = rows.groupBy(_.getString(3)).map { case (k, v) => k -> v.length }
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("weighted sample: k dense ranks per group, weight-biased, map-side limit") {
    val df = CorpusOps.tcWeightedSample(spark, dir)
    val rows = df.collect()
    // exactly SampleK per language (every lang has >= K docs at sf0.01),
    // ranks dense from 1
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to CorpusOps.SampleK),
        s"lang $lang: ranks not dense 1..${CorpusOps.SampleK}")
    }
    // Efraimidis–Spirakis with weight = n_chars must bias the pooled sample
    // toward longer documents (per-lang means are k=12 noisy; pooled is a
    // deterministic property of the fixed coin on this corpus)
    val sampleMean = rows.map(_.getLong(3)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, dir).filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      f"sample mean $sampleMean%.1f must exceed corpus mean $corpusMean%.1f")
    // the scale contract: rank-k plans as WindowGroupLimit, so every map
    // task pre-truncates to its local top-k per group BEFORE the shuffle
    val ops = PlanTestUtils.flatten(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(ops.count(_ == "WindowGroupLimitExec") >= 2,
      s"expected partial+final WindowGroupLimit, plan had: ${ops.distinct}")
  }
}
