package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third scale-mechanism proof next to BucketedJoinSpec (co-located layout)
  * and SkewJoinSpec (runtime skew split): RUNTIME ROW-LEVEL FILTERING. When a
  * fact-to-fact shuffle join has a selective predicate on one side, Spark's
  * InjectRuntimeFilter builds a bloom filter from the filtered side and
  * pushes a `might_contain` probe into the other side's SCAN — at 100 TB the
  * fact table is filtered down before it ever reaches the exchange, which is
  * the difference between shuffling the whole table and shuffling the ~1%
  * that can actually join. The spec scopes sf-scale thresholds to a child
  * session and pins (1) the bloom probe in the executed plan and (2) result
  * parity with the unfiltered plan.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  /** Selective dim side (one order priority band) joined to the lineitem
    * fact — the shape where a runtime filter pays: most lineitem rows join
    * to NO surviving order and should die at the scan. */
  private def selectiveJoin(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val o = Tables.orders(s, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
    val l = Tables.lineitem(s, sf)
    l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 4).as("sum_price"))
  }

  private def tunedChild(): org.apache.spark.sql.SparkSession = {
    spark // force parent init first
    val child = spark.newSession()
    // sf-scale thresholds: at 100 TB the defaults (10 MB creation side,
    // 10 GB application-side scan) fire on their own; the local fixture is
    // a few MB so both gates must be lowered to see the mechanism
    // fact-to-fact: neither side broadcasts at 100 TB; locally the filtered
    // orders side would slip under the 10 MB broadcast threshold and the
    // planner would skip bloom injection for a broadcast join
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    child.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    child.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    child.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    child
  }

  test("a selective join side injects a bloom probe into the fact scan") {
    val df = selectiveJoin(tunedChild())
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"),
      s"no runtime bloom filter on the fact scan:\n$planStr")
  }

  test("runtime-filtered result is identical to the unfiltered plan's result") {
    val filtered = selectiveJoin(tunedChild()).orderBy("o_orderpriority").collect()
    val plain = selectiveJoin(spark).orderBy("o_orderpriority").collect()
    assert(filtered.length == plain.length && filtered.length > 0)
    assert(filtered.sameElements(plain),
      s"runtime filter changed results: ${filtered.toSeq} vs ${plain.toSeq}")
  }
}
