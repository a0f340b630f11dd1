package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.{AtomicTable, MultiCommit}

/** Corridor contracts beyond the declared query's crash window: a crash
  * BEFORE any part leaves nothing stamped (replay applies whole), frames
  * of skipped parts are never evaluated, keyed parts bootstrap fresh
  * tables, and a duplicate root is rejected loudly. */
class MultiCommitSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)

  private def rm(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p)
      try it.iterator().asScala.toSeq.foreach(rm) finally it.close()
    }
    Files.deleteIfExists(p)
  }

  private def fresh(name: String): String = {
    val root = s"spark-warehouse/mc_$name"; rm(Paths.get(root)); root
  }

  test("crash before any part: replay applies the whole batch; skipped parts never evaluate") {
    import spark.implicits._
    val base = fresh("crash0")
    val (a, b) = (s"$base/a", s"$base/b")
    val evals = new java.util.concurrent.atomic.AtomicInteger(0)
    def parts = Seq(
      MultiCommit.Replace(a, () => { evals.incrementAndGet(); Seq((1, "x")).toDF("k", "v") }),
      MultiCommit.Append(b, () => { evals.incrementAndGet(); Seq((2, "y")).toDF("k", "v") }))
    intercept[MultiCommit.CrashWindow] {
      MultiCommit.commitBatchAll(spark, parts, "mc", 0L, crashAfter = 0)
    }
    assert(AtomicTable.currentVersion(a).isEmpty && evals.get == 0)
    assert(MultiCommit.commitBatchAll(spark, parts, "mc", 0L) == Seq(true, true))
    assert(evals.get == 2)
    // converged redelivery: all-skip, frames untouched
    assert(MultiCommit.commitBatchAll(spark, parts, "mc", 0L) == Seq(false, false))
    assert(evals.get == 2, "a skipped part evaluated its frame")
    assert(AtomicTable.read(spark, a).count() == 1L)
    assert(AtomicTable.read(spark, b).count() == 1L)
  }

  test("keyed part bootstraps a fresh table, then rides the pruned merge; duplicate roots rejected") {
    import spark.implicits._
    val base = fresh("keyed")
    val (k, l) = (s"$base/k", s"$base/l")
    def kern(b: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      b.join(c.select(col("id"), col("v").as("nv")), Seq("id"), "full_outer")
        .select(col("id"), coalesce(col("nv"), col("v")).as("v"))
    def parts(b: Int) = Seq(
      MultiCommit.Keyed(k, "id",
        () => Seq((b.toLong, b.toLong * 10)).toDF("id", "v"), kern, Seq("id")),
      MultiCommit.Replace(l, () => Seq(b).toDF("last")))
    assert(MultiCommit.commitBatchAll(spark, parts(0), "mc", 0L) == Seq(true, true))
    assert(MultiCommit.commitBatchAll(spark, parts(1), "mc", 1L) == Seq(true, true))
    assert(AtomicTable.read(spark, k).as[(Long, Long)].collect().toSet ==
      Set((0L, 0L), (1L, 10L)))
    assert(AtomicTable.read(spark, l).as[Int].collect().toSeq == Seq(1))
    // stale batch id: all-skip on every table
    assert(MultiCommit.commitBatchAll(spark, parts(0), "mc", 0L) == Seq(false, false))
    intercept[IllegalArgumentException] {
      MultiCommit.commitBatchAll(spark,
        Seq(MultiCommit.Replace(l, () => Seq(9).toDF("last")),
          MultiCommit.Replace(l, () => Seq(9).toDF("last"))), "mc", 2L)
    }
  }
}
