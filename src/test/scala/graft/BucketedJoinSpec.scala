package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the co-located bucketed join's plan: the sort-merge join over the two
  * bucketed tables must have NO shuffle exchange on either input — the
  * bucketed layout already provides the hash distribution (and sort order)
  * the join needs. This is the property that amortizes the recurring
  * orders×lineitem-shaped shuffle at 100 TB; if a metadata change ever makes
  * Spark re-shuffle a bucketed side, this fails loudly.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plans with zero exchanges below the sort-merge join") {
    val df = graft.sources.BucketedTables.bucketedJoin(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting it
    import PlanTestUtils.flatten
    val nodes = flatten(df.queryExecution.executedPlan)
    val smjs = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty,
      s"expected a sort-merge join over the bucketed tables:\n${nodes.head}")
    // the aggregate ABOVE the join still shuffles on the group keys; the
    // claim is only about the join inputs — the join subtrees must be
    // exchange-free (bucket co-location supplies the distribution)
    smjs.foreach { j =>
      val exchanges = j.children.flatMap(flatten).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join re-shuffled its input — co-location not engaged:\n${nodes.head}")
    }
  }

  test("bucketed scans expose the bucket spec (8 buckets on the join keys)") {
    val (o, l) = graft.sources.BucketedTables.bucketedPair(spark, sf)
    for ((df, key) <- Seq((o, "o_orderkey"), (l, "l_orderkey"))) {
      val scan = df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.isDefined, "no file scan for bucketed table")
      val spec = scan.get.relation.bucketSpec
      assert(spec.isDefined, "bucketed table lost its bucket spec")
      assert(spec.get.numBuckets == 8 && spec.get.bucketColumnNames == Seq(key),
        s"unexpected bucket spec: ${spec.get}")
    }
  }
}
