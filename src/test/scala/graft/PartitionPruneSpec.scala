package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sinks.PartitionedTable

/** S16 partition pruning: the claim under test is not the aggregate (the
  * driver hash covers that) but the SCAN — a partition-column predicate must
  * reach the file index as PartitionFilters and select exactly the matching
  * directories, never listing data files outside them. This is the mechanism
  * that turns a one-city/one-week job over a 100 TB table into a read of a
  * few directories. */
class PartitionPruneSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  private val sf = "/root/testdata/sf0.001"

  test("partition-column predicates prune to exactly the matching directories") {
    val path = PartitionedTable.writePartitioned(spark, sf)
    val df = PartitionedTable.prunedRead(spark, path)

    // sparkPlan, not executedPlan: AQE wraps the aggregate in an
    // AdaptiveSparkPlanExec whose inner plan collect() cannot see
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    val scan = scans.head

    // both predicates are partition-column predicates: they must ALL land in
    // PartitionFilters (none demoted to post-scan data filters)
    assert(scan.partitionFilters.nonEmpty,
      s"no PartitionFilters on the scan:\n${scan.metadata}")
    val pf = scan.partitionFilters.map(_.sql).mkString(" AND ")
    assert(pf.contains("event_type") && pf.contains("event_date"),
      s"partition filters incomplete: $pf")

    // 1 event_type of 5, 6 dates of 30 -> exactly 6 of 150 directories
    assert(scan.selectedPartitions.partitionCount == 6,
      s"expected 6 pruned partitions, got ${scan.selectedPartitions.partitionCount}")

    // the small-files guard: the pre-write repartition on the partition
    // columns leaves one file per directory
    assert(scan.selectedPartitions.totalNumberOfFiles == 6,
      s"expected one file per pruned directory, got ${scan.selectedPartitions.totalNumberOfFiles}")
  }

  test("unpruned read sees all 150 directories (the pruning is real, not layout luck)") {
    val path = PartitionedTable.tableDir(sf)
    val all = spark.read.parquet(path)
    val scan = all.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.selectedPartitions.partitionCount == 150,
      s"expected 150 partitions in the full table, got ${scan.selectedPartitions.partitionCount}")
  }
}
