package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.OrcTable

/** Pins the scale claim in [[OrcTable]]'s scaladoc: ORC consumers keep the
  * same pushdown/pruning machinery as parquet — a filtered, projected read
  * over the written table must reach the ORC scan as pushed filters and a
  * pruned read schema, not as post-scan work over full rows. */
class OrcTableSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  test("ORC read-back pushes filters and prunes columns at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = OrcTable.writeOrc(spark, sf)
    val df = spark.read.orc(dir)
      .filter(col("lang") === "en" && col("n_chars") > 100L)
      .select(col("doc_id"))
    df.write.mode("overwrite").format("noop").save()
    val scans = PlanTestUtils.flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val scan = scans.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("EqualTo(lang,en)") && pushed.contains("GreaterThan(n_chars,100)"),
      s"filters not pushed to the ORC scan: $pushed")
    // required schema = the projection + filter columns only, never `text`
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("doc_id", "lang", "n_chars"),
      s"ORC scan reads $readCols — column pruning failed")
    // and the filtered read agrees with the parquet source
    val want = Tables.documents(spark, sf)
      .filter(col("lang") === "en" && col("n_chars") > 100L).count()
    assert(spark.read.orc(dir)
      .filter(col("lang") === "en" && col("n_chars") > 100L).count() == want)
  }
}
