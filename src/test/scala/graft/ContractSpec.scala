package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: catches silent Map-merge collisions and
  * orphaned oracles when modules are added in later rounds. */
class ContractSpec extends AnyFunSuite {

  test("query keys are unique across modules (no silent overwrite)") {
    // SparkEntry.queries merges module maps with ++ — a duplicate key would
    // silently drop one implementation; compare against the per-module sum.
    // Derived from SparkEntry.modules itself so a newly registered module can
    // never drift out of this check (r11 shipped with a stale hard-coded list).
    val merged = SparkEntry.queries.size
    val sum = SparkEntry.modules.map(_._1.size).sum
    assert(merged == sum,
      s"duplicate query keys: merged=$merged, sum of modules=$sum")
    val mergedOracles = SparkEntry.oracleSql.size
    val sumOracles = SparkEntry.modules.map(_._2.size).sum
    assert(mergedOracles == sumOracles,
      s"duplicate oracle keys: merged=$mergedOracles, sum of modules=$sumOracles")
  }

  test("serp fixture domains stay on apexDomain's replayable path") {
    // the mention_trigram_scores oracle replays ONLY the executed branch of
    // TextAlgo.apexDomain (leading-www strip + last two labels); a domain
    // starting with 'http' (netloc routing) or ending with '.' (trailing
    // empty label: Scala split drops it, DuckDB string_split keeps it) would
    // silently diverge — fail loudly on a fixture edit instead
    domain.Fixtures.serpCandidates.foreach { c =>
      val dom = c._9
      assert(!dom.toLowerCase.startsWith("http"),
        s"fixture domain '$dom' would take apexDomain's netloc branch, which the oracle does not replay")
      assert(!dom.endsWith("."),
        s"fixture domain '$dom' has a trailing dot — split semantics diverge between engines")
    }
  }

  test("J5 defers name_score until after the per-probe top-1 filter") {
    // fuzzyRatio is O(|a|·|b|) with per-row allocation — fine on the 3
    // post-top-1 rows, catastrophic if a plan change ever slid it below the
    // window filter onto |part|×|probes| rows. Pin the deferred-evaluation
    // contract structurally: every Project computing NameScore must sit
    // ABOVE the rnk = 1 filter in the optimized plan.
    val spark = Sessions.local(4)
    val plan = ops.Joins.j5SimilarityJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    val nsProjects = plan.collect {
      case p: Project if p.projectList.exists(
        _.exists(_.isInstanceOf[expr.Expressions.NameScore])) => p
    }
    assert(nsProjects.nonEmpty, "no NameScore projection found in the J5 plan")
    nsProjects.foreach { p =>
      val topkBelow = p.child.collect {
        case f: Filter if f.condition.references.exists(_.name == "rnk") => f
      }
      assert(topkBelow.nonEmpty,
        s"name_score is computed below the rnk=1 filter — fuzzy would run per candidate pair:\n$plan")
    }
  }

  test("W3 volume dedup ranks inside (source_id, dedup_key) partitions") {
    // the hot mention path's dedup must never plan a GLOBAL window — at
    // corpus scale that is all mentions through one partition. Pin the
    // partitioning structurally on the volume variant's optimized plan.
    val spark = Sessions.local(4)
    val plan = domain.MentionDedup.qW3DedupVol(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val windows = plan.collect { case w: Window => w }
    assert(windows.nonEmpty, "no Window node in the W3 volume plan")
    windows.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(parts == Set("source_id", "dedup_key"),
        s"rank window must partition by (source_id, dedup_key), got $parts")
    }
  }

  test("volume variants are always hash-oracled") {
    // a _vol query exists to pin a dataflow at data scale; a rows-only _vol
    // would claim volume coverage without the hash compare that makes it real
    val volNoOracle = SparkEntry.queries.keySet.filter(_.endsWith("_vol")) --
      SparkEntry.oracleSql.keySet
    assert(volNoOracle.isEmpty, s"rows-only volume variants: $volNoOracle")
  }

  test("query names are file- and JSON-safe") {
    // Verify uses names as output directory names and Bench embeds them in
    // JSON — keep them to the safe alphabet
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe query names: $bad")
  }

  test("every oracle key has a query implementation") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL strings are non-empty and reference no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k empty")
      assert(!sql.contains("array_contains"), s"$k uses Spark-only array_contains")
      assert(!sql.toLowerCase.contains("percentile("), s"$k uses Spark-only percentile()")
    }
  }

  test("quantize matches HALF_UP round-to-cents on fixed-point inputs, both signs") {
    // Relational.quantize replaced Spark's `round(x*unit)::long` (per-row
    // BigDecimal) with floor(x*unit + 0.5). On the contract's inputs —
    // fixed-point with `scale` digits, so x*unit is an integer ± double
    // representation error, never a true half — both forms must agree for
    // both signs. Sweep a dense grid of 2- and 4-decimal values including
    // negatives (c_acctbal) and values whose double image sits just below
    // the integer (the floor trap if the +0.5 were missing).
    val spark = Sessions.local(4)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (-200000 to 200000 by 7).map(_ / 100.0) ++
      Seq(0.01, -0.01, 0.07, -0.07, 999999.99, -999999.99)
    // 123.455 is IN contract only at scale 4: at scale 2 its double image
    // ×100 lands exactly on -12345.5 — a true half, where HALF_UP (away
    // from zero) and floor(+0.5) legitimately diverge. That is the contract
    // boundary, not a bug: quantize requires ≤`scale` decimal digits.
    val grids = Map(2 -> base, 4 -> (base ++ Seq(123.455, -123.455)))
    for ((scale, vals) <- grids) {
      val unit = math.pow(10, scale)
      val bad = vals.toDF("x").select(col("x"),
          ops.Relational.quantize(col("x"), scale).as("fast"),
          round(col("x") * unit).cast("long").as("ref"))
        .filter(col("fast") =!= col("ref"))
        .collect()
      assert(bad.isEmpty, s"scale=$scale mismatches: ${bad.take(5).mkString(", ")}")
    }
  }
}
