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

  test("dynamic partition pruning: a runtime dim filter prunes the fact scan") {
    // The STATIC case above needs the partition predicate in the query text;
    // the deployed shape is a fact joined to a filtered dimension whose
    // surviving keys are only known at runtime ("the three trending days" /
    // "this batch's cities"). Spark's DPP turns the dim's broadcast into a
    // runtime partition filter on the fact scan — without it, a 100 TB
    // dim-driven job lists every directory. Pinned: the fact scan carries a
    // dynamicpruning expression, and the result matches the statically
    // filtered equivalent.
    import org.apache.spark.sql.functions._
    val path = PartitionedTable.writePartitioned(spark, sf)
    val fact = spark.read.parquet(path)
    // 3 of 30 dates survive the dim's own (non-partition) predicate
    val dim = spark.range(30)
      .select(date_add(lit("2024-01-01").cast("date"), col("id").cast("int")).as("event_date"),
        (col("id") % 10).as("flag"))
      .filter(col("flag") === 2)
    val joined = fact.join(dim, Seq("event_date"))
      .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
    val rows = joined.collect()

    val scan = joined.queryExecution.executedPlan.toString
    assert(scan.contains("dynamicpruning"),
      s"fact scan has no runtime partition filter:\n$scan")

    // parity with the static filter over the same 3 dates
    val static = fact
      .filter(col("event_date").isin("2024-01-03", "2024-01-13", "2024-01-23"))
      .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
      .collect()
    assert(rows.map(r => (r.getDate(0).toString, r.getLong(1))).toSet ==
      static.map(r => (r.getDate(0).toString, r.getLong(1))).toSet)
    assert(rows.nonEmpty)
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
