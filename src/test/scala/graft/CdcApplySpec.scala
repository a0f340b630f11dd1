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
}
