package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SchemaEvolution

/** The evolution facts the hash gate can't see: the old files REALLY lack
  * the new columns (not just null them), the merged scan carries both
  * spellings before reconciliation, and epoch-scoped reads prune. */
class SchemaEvolutionSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)
  val dir = "/root/testdata/sf0.01"

  test("epoch files have genuinely different physical schemas") {
    val path = SchemaEvolution.writeEvolved(spark, dir)
    val e1 = spark.read.parquet(s"$path/epoch=1").schema.fieldNames.toSet
    val e2 = spark.read.parquet(s"$path/epoch=2").schema.fieldNames.toSet
    assert(e1.contains("val_amount") && !e1.contains("value") && !e1.contains("channel"))
    assert(e2.contains("value") && e2.contains("channel") && !e2.contains("val_amount"))
  }

  test("reconciled read: one spelling, defaulted additions, no row lost") {
    val path = SchemaEvolution.writeEvolved(spark, dir)
    val rec = SchemaEvolution.readEvolved(spark, path)
    val cols = rec.schema.fieldNames.toSet
    assert(cols.contains("value") && !cols.contains("val_amount"))
    val total = graft.Tables.events(spark, dir).count()
    assert(rec.count() == total, "reconciliation must preserve every row")
    // epoch-1 rows carry the default; epoch-2 rows the derived channel
    assert(rec.filter(col("epoch") === 1 && col("channel") =!= "unknown").count() == 0)
    assert(rec.filter(col("epoch") === 2 && col("channel") === "unknown").count() == 0)
    // values survived the rename: totals match the source column exactly
    val src = graft.Tables.events(spark, dir).agg(sum("value")).first().getDouble(0)
    val rc = rec.agg(sum("value")).first().getDouble(0)
    assert(math.abs(src - rc) < 1e-6)
  }

  test("epoch partition prunes: an epoch-scoped read plans only that directory") {
    val path = SchemaEvolution.writeEvolved(spark, dir)
    val one = SchemaEvolution.readEvolved(spark, path).filter(col("epoch") === 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("epoch"),
      "epoch predicate must reach the scan's partition filters")
    assert(one.count() ==
      graft.Tables.events(spark, dir).filter(col("event_id") % 2 === 1).count())
  }
}
