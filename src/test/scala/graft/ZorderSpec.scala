package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.ZorderLayout

/** Pins the two claims behind S17 that the driver's hash compare cannot:
  * the bit-spread ladder really is the Morton interleave (checked against
  * an independent bit-by-bit reference), and the z-clustered layout really
  * skips — on the files actually written, a conjunctive box predicate
  * intersects a small fraction of the per-file min/max rectangles that the
  * id-ordered layout of the SAME rows admits. Per-file min/max over
  * `input_file_name()` is exactly the statistic a parquet reader's footer
  * pruning keys on, so the admitted-file count IS the scan cost model. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  /** Independent bit-by-bit Morton reference. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var k = 0
    while (k < 16) {
      z |= ((x >> k) & 1L) << (2 * k + 1)
      z |= ((y >> k) & 1L) << (2 * k)
      k += 1
    }
    z
  }

  test("bit-spread ladder equals the bit-by-bit Morton interleave") {
    val pts = for (x <- Seq(0L, 1L, 2L, 3L, 100L, 1999L, 65535L, 70000L);
                   y <- Seq(0L, 1L, 5L, 99L, 255L, 65535L, 70000L)) yield (x, y)
    val df = spark.createDataFrame(pts).toDF("x", "y")
      .select(col("x"), col("y"), ZorderLayout.zcode(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == mortonRef(x & 65535L, y & 65535L),
        s"zcode($x, $y) diverges from the Morton reference")
    }
  }

  /** Files whose [min,max] rectangle intersects the box predicate — the
    * set a footer-pruning reader must open. */
  private def admittedFiles(path: String): (Long, Long) = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
    val total = stats.count()
    val admitted = stats.filter(col("pmin") <= 100 && col("smin") <= 5).count()
    (admitted, total)
  }

  test("z-clustered files admit a small fraction of what id-order admits") {
    val zPath = ZorderLayout.zorderWrite(spark, sf)
    val linPath = "spark-warehouse/s17_lineitem_linear_test"
    Tables.lineitem(spark, sf)
      .repartitionByRange(ZorderLayout.NumFiles, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .write.mode("overwrite").parquet(linPath)

    val (zAdmit, zTotal) = admittedFiles(zPath)
    val (linAdmit, linTotal) = admittedFiles(linPath)
    assert(zTotal >= ZorderLayout.NumFiles - 2 && linTotal >= ZorderLayout.NumFiles - 2)
    // id-order scatters both keys across every file: min/max prune nothing
    assert(linAdmit > linTotal / 2,
      s"baseline unexpectedly clustered: $linAdmit of $linTotal admitted")
    // the box covers ~0.25% of the (partkey, suppkey) plane; z-locality
    // must confine it to a handful of file rectangles
    assert(zAdmit <= 8 && zAdmit * 4 < linAdmit,
      s"z-layout does not skip: $zAdmit of $zTotal admitted vs baseline $linAdmit")

    // both layouts hold the same rows: the box read agrees
    val zRows = spark.read.parquet(zPath)
      .filter(col("l_partkey") <= 100 && col("l_suppkey") <= 5).count()
    val linRows = spark.read.parquet(linPath)
      .filter(col("l_partkey") <= 100 && col("l_suppkey") <= 5).count()
    assert(zRows == linRows && zRows > 0)
  }
}
