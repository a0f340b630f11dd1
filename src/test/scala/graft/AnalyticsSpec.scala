package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent references for the round-13 analytics operators: the funnel
  * and cohort queries re-computed with plain Scala collections from the
  * raw tables (no Spark expressions, no shared formula strings), plus the
  * structural facts that make iv_revenue_merge a real incremental merge. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  test("w12_funnel matches a pure-Scala greedy matcher on every user") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val windowUs = graft.ops.Windows.FunnelHours.toLong * 3600L * 1000000L
    val want = byUser.flatMap { case (u, evs) =>
      def minAfter(t: String, after: Long, lim: Long): Option[Long] = {
        val c = evs.filter(e => e._2 == t && e._3 > after && e._3 <= lim).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      val views = evs.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val t1 = views.min
        val lim = t1 + windowUs
        val t2 = minAfter("click", t1, lim)
        val t3 = t2.flatMap(minAfter("signup", _, lim))
        val t4 = t3.flatMap(minAfter("purchase", _, lim))
        val depth = 1L + Seq(t2, t3, t4).takeWhile(_.isDefined).size
        Some(u -> ((t1, t2, t3, t4, depth)))
      }
    }
    val got = graft.ops.Windows.w12Funnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, (_, _, _, _, depth)) =>
      assert(got(u) == depth, s"user $u depth ${got(u)} != $depth")
    }
    // the funnel must actually narrow at this window, or the query is a
    // tautology on this data
    val hist = want.values.groupBy(_._5).view.mapValues(_.size).toMap
    assert(hist.keySet.size >= 3, s"degenerate depth histogram: $hist")
  }

  test("w13 cohort matrix: offset-0 is full retention, cells nest in cohort size") {
    val rows = graft.ops.Windows.w13RetentionCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n, size, ret) =>
      assert(off >= 0 && n >= 1 && n <= size)
      assert(math.abs(ret - math.rint(n * 1e6 / size) / 1e6) < 1e-9)
    }
    rows.filter(_._2 == 0L).foreach { case (cw, _, n, size, _) =>
      assert(n == size, s"cohort $cw: offset 0 must contain every member")
    }
    // reference cohort sizes from the raw table
    val first = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mo")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (c, ms) => c -> ms.map(_._2).min }
    val wantSizes = first.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val gotSizes = rows.map(r => r._1 -> r._4).toMap
    assert(gotSizes == wantSizes)
  }

  test("iv_revenue_merge: the cutoff genuinely splits the log and merge = direct") {
    val o = Tables.orders(spark, sf)
    val cut = lit(graft.ops.Temporal.IvCutoff).cast("date")
    val nBase = o.filter(col("o_orderdate") < cut).count()
    val nDelta = o.filter(col("o_orderdate") >= cut).count()
    assert(nBase > 0 && nDelta > 0,
      s"cutoff must split the log (base=$nBase delta=$nDelta) or the merge is vacuous")
    val got = graft.ops.Temporal.ivRevenueMerge(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == direct.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-3, s"$k: merged $s vs direct ${direct(k)._2}")
    }
  }

  test("dq_drift: tv_ppm matches a driver-side exact recomputation") {
    import graft.ops.Quality
    def us(s: String): Long =
      java.time.Instant.parse(s.replace(' ', 'T') + "Z").toEpochMilli * 1000L
    val (a0, a1) = (us(Quality.DriftOldFrom), us(Quality.DriftOldTo))
    val (b0, b1) = (us(Quality.DriftNewFrom), us(Quality.DriftNewTo))
    // independent fold: plain Scala maps + BigInt arithmetic (no 64-bit
    // headroom question on the reference side)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .collect()
    val types = ev.map(_.getString(0)).distinct
    val expect = types.map { t =>
      def hist(lo: Long, hi: Long): Map[Long, Long] = ev
        .filter(r => r.getString(0) == t && r.getLong(1) >= lo && r.getLong(1) < hi)
        .groupBy(r => math.floor(r.getDouble(2) / Quality.BinWidth).toLong)
        .map { case (b, rs) => b -> rs.length.toLong }
      val (ha, hb) = (hist(a0, a1), hist(b0, b1))
      val (na, nb) = (ha.values.sum, hb.values.sum)
      val bins = (ha.keySet ++ hb.keySet)
      val s = bins.toSeq.map(b => (BigInt(ha.getOrElse(b, 0L)) * nb -
        BigInt(hb.getOrElse(b, 0L)) * na).abs).sum
      t -> ((na, nb, bins.size.toLong, (s * 500000 / (BigInt(na) * nb)).toLong))
    }.toMap
    val got = Quality.dqDrift(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (t, v) =>
      assert(v == expect(t), s"$t: engine $v vs reference ${expect(t)}")
      assert(v._4 >= 0L && v._4 <= 1000000L, s"$t: tv_ppm out of [0, 1e6]")
    }
  }

  test("dq_drift tv_ppm: DECIMAL(38) promotion is exact in the BIGINT-overflow regime") {
    import spark.implicits._
    // (s, n_old, n_new) triples spanning: small counts, the old BIGINT
    // boundary (s·5e5 = 9e18, just under 2^63), the first counts past 3e6
    // (where a BIGINT s·500000 would overflow), and epoch sizes of
    // petabyte-scale logs (1e10-row epochs). `s` is cast to DECIMAL(38,0)
    // exactly as dqDrift's aggregate delivers it (the promotion lives at the
    // SOURCE — the per-bin products — not at the division; r15 advice).
    // Expected values computed in driver-side BigInt — the same
    // ⌊s·5e5/(n_old·n_new)⌋ the oracle's HUGEINT arithmetic yields.
    val cases = Seq(
      (1234567L, 1000L, 2000L),                     // small counts
      (18000000000000L, 3000000L, 3000000L),        // boundary: s·5e5 = 9e18
      (9000006000001L, 3000001L, 3000001L),         // past the old guard
      (5000000000000000000L, 4000000000L, 2500000000L), // 1e10-row epochs
      (0L, 5000000000L, 5000000000L),               // zero drift, huge n
      (123L, 0L, 5000000000L))                      // empty epoch → full drift
    val got = cases.toDF("s0", "n_old", "n_new")
      .withColumn("s", col("s0").cast("decimal(38,0)"))
      .withColumn("tv_ppm", expr(graft.ops.Quality.TvPpmExpr))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    cases.foreach { case c @ (s, no, nn) =>
      val want =
        if (no == 0L || nn == 0L) 1000000L
        else ((BigInt(s) * 500000) / (BigInt(no) * BigInt(nn))).toLong
      assert(got(c) == want, s"$c: engine ${got(c)} vs exact $want")
    }
  }

  test("dq_profile: planted nulls, dups, and extremes are all reported") {
    import spark.implicits._
    // all instants in UTC — the session TZ the engine and oracle share
    def utc(s: String): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.parse(s))
    val rows = Seq(
      (1L, Option(10L), "O", 10.00, utc("2024-03-05T10:00:00Z"), "1-URGENT"),
      (1L, Option(11L), "F", 99999.99, utc("2024-07-31T23:59:59Z"), "5-LOW"),
      (2L, Option.empty[Long], "P", 0.01, utc("2024-03-05T10:00:00Z"), "3-MEDIUM"))
    val dir = java.nio.file.Files.createTempDirectory("graftprof").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(dir + "/orders.parquet")
    val p = graft.ops.Quality.dqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    p.values.foreach(r => assert(r.getLong(1) == 3L))        // n_rows everywhere
    val ok = p("o_orderkey")
    assert(ok.getLong(2) == 0L && ok.getLong(3) == 2L)       // dup key: distinct < rows
    assert(ok.getString(4) == "1" && ok.getString(5) == "2" && ok.isNullAt(6))
    val ck = p("o_custkey")
    assert(ck.getLong(2) == 1L && ck.getLong(3) == 2L)       // the planted null
    assert(ck.getString(4) == "10" && ck.getString(5) == "11")
    val tp = p("o_totalprice")
    assert(tp.getString(4) == "1" && tp.getString(5) == "9999999") // exact cents
    val od = p("o_orderdate")
    assert(od.getLong(3) == 2L)
    assert(od.getString(4) == "2024-03-05 10:00:00" && od.getString(5) == "2024-07-31 23:59:59")
    val st = p("o_orderstatus")
    assert(st.getLong(3) == 3L && st.getString(4) == "F" && st.getString(5) == "P")
    assert(st.getLong(6) == 3L)                              // 3 single-char statuses
    val pr = p("o_orderpriority")
    assert(pr.getString(4) == "1-URGENT" && pr.getString(5) == "5-LOW")
    assert(pr.getLong(6) == 21L)                             // 8 + 5 + 8
  }

  test("dq_profile: schema drift from the registry fails loudly, as does a contract-less type") {
    import spark.implicits._
    // (a) a regen that changes a pinned column's TYPE KIND must throw at the
    // query, not silently hash-mismatch: plant orders with o_totalprice as a
    // string — the live dispatch (ReprString) disagrees with the registry's
    // ReprCents
    val dir = java.nio.file.Files.createTempDirectory("graftdrift").toString
    Seq((1L, 1L, "O", "10.00", java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(dir + "/orders.parquet")
    val e = intercept[IllegalArgumentException](
      graft.ops.Quality.dqProfile(spark, dir).collect())
    assert(e.getMessage.contains("drifted"), e.getMessage)
    // (b) a type with no repr contract refuses to dispatch
    val e2 = intercept[IllegalArgumentException](
      graft.ops.Quality.reprFor(org.apache.spark.sql.types.BinaryType))
    assert(e2.getMessage.contains("no repr contract"), e2.getMessage)
    // (c) the registry itself matches the real testdata loaders for every
    // profiled table (the pin the static oracles rest on)
    graft.ops.Quality.ProfileSchemas.foreach { case (t, pinned) =>
      val df = t match {
        case "orders" => Tables.orders(spark, sf)
        case "lineitem" => Tables.lineitem(spark, sf)
        case "documents" => Tables.documents(spark, sf)
        case "embeddings" => Tables.embeddings(spark, sf)
      }
      val live = df.schema.fields.toSeq.map(f => f.name -> graft.ops.Quality.reprFor(f.dataType))
      assert(live == pinned, s"$t: live=$live pinned=$pinned")
    }
  }

  test("dq_profile: every branch's scan is pruned to its own single column") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.ops.Quality.dqProfile(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val scans = PlanTestUtils.flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSeq }
    assert(scans.size == 6, s"expected 6 per-column scans, got ${scans.size}")
    scans.foreach(cols => assert(cols.size == 1,
      s"a profiler branch reads ${cols.mkString(",")} — column pruning failed"))
    assert(scans.flatten.toSet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
  }
}
