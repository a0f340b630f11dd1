package graft

import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the AQE half of the skew story (SkewDedupSpec covers the manual
  * half). `j_skew_aqe_join` plants ~40% of lineitem on one join key; a
  * skewed equi-JOIN — unlike a skewed window — is exactly what
  * OptimizeSkewedJoin handles at runtime, so the engineering claim to pin is
  * "declare the join, the runtime splits the hot partition". The spec scopes
  * sf-scale skew thresholds to a child session (the parent's conf must not
  * see them — same isolation rule as the contraction loop) and asserts the
  * executed sort-merge join actually ran with `isSkewJoin`, with results
  * identical to the parent session's untuned plan. At 100 TB no tuning is
  * needed: default thresholds (256 MB advisory) fire on real partitions.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  test("AQE splits the planted hot partition: executed join has isSkewJoin") {
    spark // force parent init first so the child inherits a live context
    val child = spark.newSession()
    // sf0.1 + sf-scale thresholds: the hot key shuffles ~240k rows
    // (hundreds of KB compressed) vs a ~25 KB median — the same 10x ratio a
    // 100 TB viral key produces against default 256 MB thresholds. At sf0.01
    // lz4 squeezes the constant-key hot partition under 64 KB and AQE just
    // coalesces everything instead.
    val sfPlan = "/root/testdata/sf0.1"
    child.conf.set("spark.sql.shuffle.partitions", "16")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    child.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    // the aggregate above the join would otherwise veto the split (extra
    // shuffle introduced); production fact-to-fact joins set this too when
    // the straggler dominates the extra exchange
    child.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // repartition(16) reconstructs the many-mapper shape a cluster scan has:
    // AQE splits a skewed reduce partition by MAPPER ranges, and the local
    // single-row-group parquet file yields ONE data-bearing mapper —
    // structurally unsplittable no matter the thresholds
    val df = graft.ops.Joins.skewJoinAgg(
      Tables.lineitem(child, sfPlan).repartition(16),
      Tables.nation(child, sfPlan))
    df.collect() // finalize the adaptive plan
    val smjs = PlanTestUtils.flatten(df.queryExecution.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"no sort-merge join:\n${df.queryExecution.executedPlan}")
    assert(smjs.exists(_.isSkewJoin),
      s"hot partition was not skew-split:\n${df.queryExecution.executedPlan}")
  }

  test("skew-split result is identical to the untuned plan's result") {
    val tuned = {
      val child = spark.newSession()
      child.conf.set("spark.sql.shuffle.partitions", "16")
      child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      child.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      child.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      child.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      graft.ops.Joins.jSkewAqeJoin(child, sf).orderBy("n_name").collect()
    }
    val untuned = graft.ops.Joins.jSkewAqeJoin(spark, sf).orderBy("n_name").collect()
    assert(tuned.length == untuned.length && tuned.length > 0)
    assert(tuned.sameElements(untuned),
      s"skew split changed results: ${tuned.zip(untuned).find { case (a, b) => a != b }}")
  }

  test("parent session does not see the child's skew tuning") {
    val parentAdvisory =
      spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    assert(!parentAdvisory.contains("65536"),
      "child-session skew tuning leaked into the shared session")
  }
}
