package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** Pins the PageRank dataflow against an independent pure-Scala power
  * iteration over the same integer-mass semantics, plus the structural
  * facts that make the operator meaningful: the thresholded graph really
  * has dangling nodes (so the redistribution path is exercised), and the
  * total mass stays within floor-division leakage of the full Scale. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private lazy val refEdges: Map[(Long, Long), Long] = {
    import org.apache.spark.sql.functions._
    // compare ship instants as ISO strings: uniform format sorts identically
    // and sidesteps the parquet NTZ-vs-date physical-type question entirely
    val fs = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(min(col("l_shipdate")).cast("string").as("d"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    fs.groupBy(_._1).values.flatMap { order =>
      for {
        a <- order; b <- order
        if a._3 < b._3
      } yield (a._2, b._2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .toSeq.sortBy { case ((s, d), w) => (-w, s, d) }.take(Graph.TopE).toMap
  }

  private def refRanks: Map[Long, Long] = {
    val nodes = (refEdges.keys.map(_._1) ++ refEdges.keys.map(_._2)).toSet
    val n = nodes.size.toLong
    val wout = refEdges.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val init = Graph.Scale / n
    val tele = (init * (Graph.DampDen - Graph.DampNum)) / Graph.DampDen
    var pr = nodes.map(_ -> init).toMap
    for (_ <- 1 to Graph.Iters) {
      // iterator, not Set.map: equal dangling ranks must not collapse
      val dmass = nodes.iterator.filterNot(wout.contains).map(pr).sum
      val contrib = refEdges.toSeq
        .map { case ((s, d), w) => d -> (pr(s) * w) / wout(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = nodes.map { nd =>
        nd -> (tele + (Graph.DampNum *
          (contrib.getOrElse(nd, 0L) + dmass / n)) / Graph.DampDen)
      }.toMap
    }
    pr
  }

  test("engine ranks match the pure-Scala power iteration exactly") {
    val got = Graph.gPagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refRanks)
  }

  test("edge build plans one scan, no data-sized broadcast, top-E as TakeOrdered") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val plan = graft.ops.Graph.edges(spark, sf).queryExecution.sparkPlan
    // the r13 regression this pins: the self-join form planned the
    // per-(order,supplier) relation TWICE and broadcast it data-sized
    val scans = plan.collect {
      case s if s.nodeName.toLowerCase.contains("scan parquet") => s
      case s if s.getClass.getSimpleName == "FileSourceScanExec" => s
    }
    assert(scans.size == 1, s"expected one lineitem scan, got ${scans.size}")
    val broadcasts = plan.collect {
      case b: BroadcastExchangeExec => b
      case b: BroadcastHashJoinExec => b
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(broadcasts.isEmpty, "edge build must not broadcast a data-sized side")
    assert(plan.collect {
      case t if t.getClass.getSimpleName.startsWith("TakeOrderedAndProject") => t
    }.nonEmpty, "top-E must plan as TakeOrderedAndProject, not a full sort")
  }

  test("the thresholded graph has dangling nodes and the mass balance holds") {
    val srcs = refEdges.keys.map(_._1).toSet
    val nodes = srcs ++ refEdges.keys.map(_._2)
    val dangling = nodes -- srcs
    assert(dangling.nonEmpty, "threshold must leave dangling nodes or the " +
      "redistribution path is dead code at this SF")
    val mass = refRanks.values.sum
    // every floor division leaks < 1 unit; |nodes| + |edges| + K bounds it
    assert(mass <= Graph.Scale &&
      Graph.Scale - mass < (nodes.size + refEdges.size).toLong * Graph.Iters,
      s"mass $mass drifted from ${Graph.Scale}")
  }
}
