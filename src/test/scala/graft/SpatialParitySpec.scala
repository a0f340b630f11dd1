package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.domain.Spatial

/** The cell-prefilter spatial join must produce byte-identical assignments to
  * the broadcast ray-cast path — it's the same operator behind a different
  * physical strategy (SURVEY §4 item 2). */
class SpatialParitySpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      Option(r.getString(3)), Option(r.getString(4)))).toSet

  test("assignViaCells == assign on the fixture") {
    val pois = Spatial.spatialPoisDf(spark)
    val areas = Spatial.areasDf(spark)
    val direct = collectAssign(Spatial.assign(pois, areas, spark))
    for (res <- 9 to 11) {
      val viaCells = collectAssign(Spatial.assignViaCells(pois, areas, spark, res))
      assert(viaCells == direct, s"divergence at res $res")
    }
  }

  test("assignViaCells == assign on a denser random grid of points") {
    import spark.implicits._
    // deterministic lattice of points across and around the fixture rects
    val pts = for {
      i <- 0 until 40
      j <- 0 until 20
    } yield (s"g$i-$j", 48.845 + i * 0.002, 2.295 + j * 0.004)
    val pois = pts.toDF("poi_id", "lat", "lng")
    val areas = Spatial.areasDf(spark)
    val direct = collectAssign(Spatial.assign(pois, areas, spark))
    val viaCells = collectAssign(Spatial.assignViaCells(pois, areas, spark))
    assert(viaCells == direct)
  }
}
