package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Compaction

/** Pins the three compaction claims the driver's hash row can't see: the
  * size-target bin-packing actually bounds per-directory file counts, the
  * rewrite is SELECTIVE (a second round touches only the re-fragmented
  * partition), and untouched directories survive byte-identical — the
  * dynamic-overwrite contract that makes maintenance safe to run while
  * other partitions serve reads. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private def fileSig(path: String): Map[String, Set[(String, Long)]] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path)).filter(_.isDirectory).map { d =>
      d.getPath.getName -> fs.listStatus(d.getPath)
        .filter(_.getPath.getName.startsWith("part-"))
        .map(f => (f.getPath.getName, f.getLen)).toSet
    }.toMap
  }

  test("size-target bin-packing bounds per-directory file counts") {
    val path = Compaction.fragmentWrite(spark, sf)
    val before = Compaction.partitionStats(spark, path)
    assert(before.values.forall(_._1 == Compaction.FragmentFiles),
      "fragmented state must hold FragmentFiles files per directory")
    // tiny target → multi-file bins, still far below the fragment count
    val target = 16L * 1024
    val affected = Compaction.compact(spark, path, target)
    assert(affected.toSet == before.keySet, "every fragmented dir must compact")
    val after = Compaction.partitionStats(spark, path)
    after.foreach { case (p, (files, bytes)) =>
      val goal = math.max(1L, (bytes + target - 1) / target)
      assert(files <= goal && files < Compaction.FragmentFiles,
        s"$p: $files files vs goal $goal")
    }
  }

  test("second round rewrites only the re-fragmented partition; others survive byte-identical") {
    val path = Compaction.fragmentWrite(spark, sf)
    assert(Compaction.compact(spark, path).nonEmpty) // settle: 1 file per dir
    val settled = fileSig(path)
    assert(settled.values.forall(_.size == 1))
    val total0 = spark.read.parquet(path).count()
    val clickRows = spark.read.parquet(path)
      .filter(col("event_type") === "click").count()

    // an incremental writer re-fragments ONE partition
    Tables.events(spark, sf).filter(col("event_type") === "click")
      .repartition(8)
      .write.mode("append").partitionBy("event_type").parquet(path)
    assert(fileSig(path)("event_type=click").size == 9)

    val affected = Compaction.compact(spark, path)
    assert(affected == Seq("click"), s"selective rewrite violated: $affected")
    val after = fileSig(path)
    assert(after("event_type=click").size == 1, "click must re-settle to one file")
    settled.filterNot(_._1 == "event_type=click").foreach { case (dir, sig) =>
      assert(after(dir) == sig, s"$dir was touched by a compaction it wasn't part of")
    }
    // nothing lost, nothing duplicated beyond the deliberate append
    assert(spark.read.parquet(path).count() == total0 + clickRows)
  }
}
