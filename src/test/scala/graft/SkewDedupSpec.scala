package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the planted-skew W3 variant (VERDICT r11 item 3).
  *
  * The scenario: one viral (source_id, dedup_key) holds ~40% of the mention
  * corpus (reference: dedup.py:47-96 — a domain going viral). A plain
  * row_number window would funnel that 40% through ONE task (AQE cannot
  * split a window partition); [[graft.domain.MentionDedup.windowDedupSkewSafe]]
  * bounds every task by salting the first ranking stage. This spec pins:
  *  1. the fixture actually IS skewed (top key ≥ 35% of rows);
  *  2. the optimized plan ranks in two stages — the lower window partitioned
  *     by (source_id, dedup_key, salt), the upper by (source_id, dedup_key);
  *  3. the global stage's input is bounded per key (≤ k·salts rows), i.e.
  *     the straggler is structurally gone, not just lucky;
  *  4. the two-stage result is row-identical to the direct one-window rank.
  */
class SkewDedupSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  import graft.domain.MentionDedup._

  test("fixture plants a viral key holding >= 35% of rows") {
    val df = mentionsW3SkewDf(spark, sf).cache()
    try {
      val total = df.count()
      val top = df.groupBy("source_id", "dedup_key").count()
        .orderBy(col("count").desc).head()
      val frac = top.getAs[Long]("count").toDouble / total
      assert(frac >= 0.35 && frac <= 0.55,
        s"viral key ${top.getString(1)} holds ${frac * 100}%% of $total rows")
    } finally df.unpersist()
  }

  test("plan ranks in two stages: salted local window below per-key global window") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val plan = qW3DedupSkew(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: Window => w }
    assert(windows.size == 2, s"expected 2 window stages, got ${windows.size}:\n$plan")
    val partSpecs = windows.map(_.partitionSpec.flatMap(_.references.map(_.name)).toSet)
    assert(partSpecs.contains(Set("source_id", "dedup_key", "salt")),
      s"no salted local window stage, partitions: $partSpecs")
    assert(partSpecs.contains(Set("source_id", "dedup_key")),
      s"no per-key global window stage, partitions: $partSpecs")
    // the salted stage must sit BELOW the global one (it is the task-bounder)
    val global = windows.find(
      _.partitionSpec.flatMap(_.references.map(_.name)).toSet == Set("source_id", "dedup_key")).get
    val saltedBelow = global.child.collect {
      case w: Window if w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        .contains("salt") => w
    }
    assert(saltedBelow.nonEmpty, s"salted window is not below the global window:\n$plan")
  }

  test("global ranking stage sees a bounded group per key, even for the viral key") {
    // rebuild the local stage exactly as windowDedupSkewSafe does and count
    // the survivors per key: must be <= maxPerWindow * salts regardless of
    // how hot the key is — this is the structural straggler bound
    val m = mentionsW3SkewDf(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source_id"), col("dedup_key"), col("salt"))
      .orderBy((col("authority_weight_snapshot") * col("w_time")).desc, col("ord").asc)
    val survivors = m.withColumn("salt", pmod(hash(col("mid")), lit(32)))
      .withColumn("rnk_local", row_number().over(w))
      .filter(col("rnk_local") <= 2)
      .groupBy("source_id", "dedup_key").count()
    val maxGroup = survivors.agg(max("count")).head().getLong(0)
    assert(maxGroup <= 2L * 32,
      s"global stage would see a $maxGroup-row group — salting failed to bound it")
  }

  test("salted two-stage rank is row-identical to the direct one-window rank") {
    val m = mentionsW3SkewDf(spark, sf)
    val twoStage = windowDedupSkewSafe(m)
      .select("mid", "source_id", "dedup_key", "rnk")
      .orderBy("mid").collect()
    val direct = windowDedup(m)
      .select("mid", "source_id", "dedup_key", "rnk")
      .orderBy("mid").collect()
    assert(twoStage.length == direct.length,
      s"row counts differ: ${twoStage.length} vs ${direct.length}")
    assert(twoStage.sameElements(direct), "two-stage and direct rankings diverge")
  }
}
