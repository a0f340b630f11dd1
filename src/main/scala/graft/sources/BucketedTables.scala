package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Co-located joins via bucketing (SURVEY §6 scale plan; the 100 TB shape for
  * the engine's recurring big×big joins).
  *
  * Every operator that joins orders-scale to lineitem-scale data pays a full
  * shuffle of BOTH sides per run. The reference re-reads its store per city
  * per day (run_pipeline.py:549-581), i.e. the same join keys recur run after
  * run — exactly the case where bucketing amortizes the shuffle: write both
  * tables bucketed (and sorted) by the join key ONCE, and every subsequent
  * join plans as a zero-exchange sort-merge join over matching buckets.
  * `q_bucketed_join` proves it end to end: bucketed write → catalog read →
  * join+aggregate with NO ShuffleExchange on either side
  * (BucketedJoinSpec asserts the executed plan), hash-checked against DuckDB
  * on the un-bucketed source.
  *
  * Local mapping of the cluster story: 8 buckets stand in for the hundreds a
  * real deployment would use (bucket count ≈ target parallelism; each bucket
  * must fit an executor's sort buffer). The bucketed table lives in the
  * session catalog (in-memory catalog + parquet files under
  * spark-warehouse/), the same `bucketBy` metadata a shared metastore would
  * carry on a cluster.
  */
object BucketedTables {

  private val Buckets = 8

  /** Deterministic per-sf table names (bench at sf0.1 and verify at sf0.01
    * must not clobber each other). Dots are illegal in table identifiers. */
  private def suffix(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  /** Write `df` as a bucketed+sorted catalog table if this session has not
    * already done so (the catalog is session-scoped, so existence implies a
    * complete write by THIS session — Verify and Bench each write once, then
    * every timed run reads). */
  private def ensureBucketed(spark: SparkSession, name: String, df: => DataFrame,
      key: String): Unit = {
    if (!spark.catalog.tableExists(name)) {
      // the in-memory catalog dies with the JVM but the warehouse directory
      // persists — a stale location from a previous run fails CREATE TABLE
      // with LOCATION_ALREADY_EXISTS, so clear it before the fresh write
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write
        .bucketBy(Buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    }
  }

  /** The two sides of the recurring join, bucketed on the join key. */
  def bucketedPair(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sfx = suffix(dir)
    val oName = s"orders_bkt_$sfx"
    val lName = s"lineitem_bkt_$sfx"
    ensureBucketed(spark, oName, Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority", "o_orderstatus"), "o_orderkey")
    ensureBucketed(spark, lName, Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"),
      "l_orderkey")
    (spark.table(oName), spark.table(lName))
  }

  /** The join under test, exposed so the spec asserts the plan of the exact
    * DataFrame the query runs: bucket-wise sort-merge join, no exchange. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (o, l) = bucketedPair(spark, dir)
    // merge hint: at 100 TB neither side broadcasts — force the sort-merge
    // strategy locally too, so the tested plan IS the cluster plan (without
    // it, small-sf size estimates pick a broadcast join and the bucket
    // co-location under test never engages)
    o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }

  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoin(spark, dir)
      .select(col("o_orderpriority"), col("l_returnflag"), col("n_items"),
        col("revenue"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j_bucketed_colocated" -> (qBucketedJoin _))

  /** The oracle replays the SAME join/aggregate over the UN-bucketed source
    * parquet — covering the bucketed write, catalog read, and co-located
    * join end to end. */
  val oracles: Map[String, String] = Map(
    "j_bucketed_colocated" ->
      """SELECT o_orderpriority, l_returnflag,
        |  count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin)
}
