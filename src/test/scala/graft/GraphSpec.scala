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

  test("g_triangles matches a brute-force reference on the real sf0.01 graph") {
    val e = Graph.edges(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = e.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val want = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((u, v) <- und; w <- adj(u) if w > v && adj(v).contains(w)) {
      want(u) += 1; want(v) += 1; want(w) += 1
    }
    val got = Graph.gTriangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want.toMap, s"engine $got vs reference $want")
    assert(got.nonEmpty, "co-shipment graph has no triangles at sf0.01 — test is vacuous")
  }

  test("triangles on a planted hub: orientation keeps the star wedge-free") {
    import spark.implicits._
    // a 1000-leaf star (hub 0, leaves 10..1009) + a triangle sharing only
    // ONE leaf (10, 2000, 2001 — two leaves would close a second triangle
    // through the hub): raw adjacency would enumerate ~500k wedge pairs at
    // the hub; the degree orientation points every star edge leaf->hub
    // (leaf degree ≤ 3 < 1000), so the hub has out-degree 0 and contributes
    // NOTHING to the wedge join — the only triangle is the planted one
    val star = (10L to 1009L).map(i => (i, 0L))
    val tri = Seq((10L, 2000L), (2000L, 2001L), (10L, 2001L))
    val edges = (star ++ tri).toDF("src", "dst").withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val got = graft.ops.Graph.trianglesOn(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 2000L -> 1L, 2001L -> 1L))
  }

  test("g_khop_reach matches a pure-Scala BFS on the real sf0.01 graph") {
    val e = Graph.edges(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = e.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
    val allNodes = und.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var dist = allNodes.take(Graph.Seeds).map(_ -> 0L).toMap
    for (h <- 1 to Graph.Hops) {
      val next = dist.keys.flatMap(adj).filterNot(dist.contains).map(_ -> h.toLong)
      dist = dist ++ next
    }
    val got = Graph.gKhopReach(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist, "BFS distances diverge from the reference")
    // the co-shipment cluster is dense: everything reachable lands within 2
    // hops at sf0.01 — pin that MULTIPLE hops genuinely ran, not the exact
    // horizon (which the graph's diameter, not the operator, decides)
    assert(got.values.max >= 2L, "frontier never advanced past hop 1")
  }
}
