package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the TPC-H gallery's scale claims (ops/Relational).
  * The driver hash proves the VALUES; these tests prove the claims the
  * Scaladoc makes about HOW each query executes — the properties that decide
  * whether the shape survives a 100 TB scale-up.
  */
class TpchPlanSpec extends AnyFunSuite {

  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  test("q6: every predicate reaches the lineitem scan as a pushed filter") {
    val plan = ops.Relational.q6ForecastRevenue(spark, sf)
      .queryExecution.sparkPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
    val pushed = scans.head.metadata("PushedFilters")
    // date range, discount band, quantity cap — all literal comparisons on
    // scan columns, so all must appear (a quantize()-style computed
    // predicate would silently vanish from this list)
    for (col <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(col), s"$col missing from PushedFilters: $pushed")
    // and nothing but the aggregate's inputs is read
    val readSchema = scans.head.metadata("ReadSchema")
    for (col <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
      assert(readSchema.contains(col), s"$col missing from ReadSchema")
    assert(!readSchema.contains("l_orderkey"),
      s"unprojected column read: $readSchema")
  }

  test("q4: EXISTS plans as a left semi hash join on the order key") {
    val plan = ops.Relational.q4OrderPriority(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    // the priority groupBy must carry partial aggregation (map-side combine)
    assert(plan.contains("partial_count"), "no map-side partial aggregate")
  }

  test("q10: global top-20 plans as TakeOrderedAndProject, not a sort") {
    val plan = ops.Relational.q10ReturnedRevenue(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-partition heap + driver merge, got:\n$plan")
  }

  test("q2: decorrelated min joins back as equi joins — no cartesian") {
    val plan = ops.Relational.q2MinCostSupplier(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"min join-back must stay equi:\n$plan")
    assert(plan.contains("partial_min"), "no map-side partial min")
  }

  test("q16: pair dedup partial-aggregates before the shuffle; anti join on the exclusion list") {
    val plan = ops.Relational.q16SupplierCount(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    // the distinct over (partkey, suppkey) must combine map-side so the
    // dedup shuffle carries distinct pairs, not raw lineitem
    assert(plan.contains("HashAggregate"), "pair dedup must be an aggregate")
  }

  test("q20: qualifying suppliers enter supplier as a left semi join") {
    val plan = ops.Relational.q20PromotionSuppliers(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
  }

  test("q12: scan prunes on the date window and the flag IN-list") {
    val plan = ops.Relational.q12PriorityLines(spark, sf)
      .queryExecution.sparkPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    val li = scans.find(_.metadata("Location").contains("lineitem")).get
    val pushed = li.metadata("PushedFilters")
    for (c <- Seq("l_shipdate", "l_returnflag"))
      assert(pushed.contains(c), s"$c missing from PushedFilters: $pushed")
  }

  test("q3: billion-group top-10 plans as TakeOrderedAndProject over a semi-gated join") {
    val plan = ops.Relational.q3ShippingPriority(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-partition heap, got:\n$plan")
    assert(plan.contains("LeftSemi"), s"segment gate must be a semi join:\n$plan")
  }

  test("q8: region/nation dims broadcast; no shuffle of a dim-sized side") {
    val plan = ops.Relational.q8MarketShare(spark, sf)
      .queryExecution.sparkPlan
    val broadcasts = plan.collect {
      case j if j.getClass.getSimpleName.startsWith("BroadcastHashJoin") => j
    }
    // nation (customer side), region, nation (supplier side) at minimum —
    // part/customer/supplier may or may not broadcast depending on AQE/SF,
    // but the three true dims must never plan as shuffle joins
    assert(broadcasts.size >= 3,
      s"expected >=3 broadcast dim joins, got ${broadcasts.size}:\n$plan")
  }
}
