package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.CdcApply

/** Class-by-class contracts of the CDC apply the hash gate proves only in
  * aggregate: deletes gone, updates landed, update-then-delete nets to the
  * delete (the sequence fold keeps the LATEST change), inserts present with
  * the synthesized name, everything else byte-identical pass-through. */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  test("every change class lands with its MERGE semantics") {
    val out = CdcApply.qS23CdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"),
        graft.ops.Relational.quantize(col("c_acctbal"), 2).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    val (dels, upds, netDels) = (
      base.keys.filter(_ % CdcApply.ChangeMod == 0),
      base.keys.filter(_ % CdcApply.ChangeMod == 1),
      base.keys.filter(_ % CdcApply.ChangeMod == 2))
    assert(dels.nonEmpty && upds.nonEmpty && netDels.nonEmpty, "fixture classes empty")
    dels.foreach(k => assert(!out.contains(k), s"deleted key $k survived"))
    netDels.foreach(k => assert(!out.contains(k),
      s"update-then-delete key $k survived — the fold kept the stale update"))
    upds.foreach { k =>
      assert(out(k)._2 == k * 100L, s"update on $k not applied")
      assert(out(k)._1 == base(k)._1, s"update on $k clobbered the name")
    }
    (0 until CdcApply.Inserts).foreach { i =>
      val k = CdcApply.InsertBase + i
      assert(out.get(k).contains(("cdc_inserted", i * 7L)), s"insert $k missing")
    }
    base.keys.filterNot(k => Seq(0L, 1L, 2L).contains(k % CdcApply.ChangeMod))
      .foreach(k => assert(out(k) == base(k), s"unchanged key $k drifted"))
    assert(out.size == base.size - dels.size - netDels.size + CdcApply.Inserts)
  }

  test("streamed apply across uneven micro-batch cuts == the batch apply") {
    // the feed arrives as three files — seq-1 changes split by key parity,
    // then ALL seq-2 entries (class-2 deletes) in the last file, so a key's
    // update and its later delete land in DIFFERENT micro-batches: per-batch
    // apply over the committed state must still net to the delete. Each
    // micro-batch commits through commitBatch (exactly-once under
    // foreachBatch's at-least-once delivery).
    import graft.sinks.AtomicTable
    val tmp = java.nio.file.Files.createTempDirectory("graftcdc").toString
    val (feedDir, root) = (s"$tmp/feed", s"$tmp/table")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feedDir))
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        graft.ops.Relational.quantize(col("c_acctbal"), 2).cast("long").as("bal_c"))
    AtomicTable.commit(base, root)
    val feed = CdcApply.changeFeed(spark, sf)
    Seq(
      feed.filter(col("seq") === 1 && col("id") % 2 === 0),
      feed.filter(col("seq") === 1 && col("id") % 2 === 1),
      feed.filter(col("seq") === 2)
    ).zipWithIndex.foreach { case (slice, i) =>
      val f = s"$feedDir/b$i"
      slice.coalesce(1).write.mode("overwrite").parquet(f)
      // mtime order = delivery order under maxFilesPerTrigger=1
      val dir = java.nio.file.Paths.get(f)
      java.nio.file.Files.list(dir).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L)))
    }
    val schema = spark.read.parquet(s"$feedDir/b0").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/b*")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        assert(AtomicTable.commitBatch(
          CdcApply.apply(AtomicTable.read(spark, root), b), root, "cdc-stream", bid))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    assert(q.awaitTermination(120000), "AvailableNow stream timed out")
    val streamed = AtomicTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
    val batch = CdcApply.qS23CdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(streamed == batch,
      s"streamed != batch; first diff: ${(streamed.toSet diff batch.toSet).take(3)}")
  }
}
