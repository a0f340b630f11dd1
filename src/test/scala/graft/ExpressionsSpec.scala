package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.{functions => F}

/** Catalyst-expression integration: evaluation via both interpreted and
  * whole-stage-codegen paths, plus SQL registration. */
class ExpressionsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)
  import spark.implicits._

  test("custom expressions evaluate over a DataFrame") {
    val df = Seq(
      ("L'Ambroisie", "lambroisie", "https://www.lefooding.com/fr/fr/a/b-v2"),
      ("Café de Flore", "cafe de flore paris review", "https://guide.michelin.com/fr/paris/abc.html"))
      .toDF("a", "b", "url")
    val out = df.select(
      F.normalize_text(col("a")).as("norm"),
      F.trigram_similarity(col("a"), col("b")).as("tri"),
      F.fuzzy_ratio(lower(col("a")), lower(col("b"))).as("fz"),
      F.name_score(col("a"), col("b")).as("ns"),
      F.dedupe_key(col("url")).as("dk"),
      F.domain_of(col("url")).as("dom"),
      F.apex_domain(F.domain_of(col("url"))).as("apex")).collect()

    assert(out(0).getString(0) == "lambroisie")
    assert(math.abs(out(0).getDouble(1) - 0.6666666667) < 1e-9)
    assert(math.abs(out(0).getDouble(2) - 0.9523809524) < 1e-9)
    assert(out(0).getDouble(3) >= 0.95) // name_score = max(...) ≥ fuzzy
    assert(out(0).getString(4) == "www.lefooding.com/a/b")
    assert(out(0).getString(5) == "lefooding.com")
    assert(out(1).getString(5) == "guide.michelin.com")
    assert(out(1).getString(6) == "michelin.com")
  }

  test("null-safety: null inputs yield null outputs") {
    val df = Seq((Option.empty[String], Option.empty[String])).toDF("a", "b")
    val r = df.select(
      F.normalize_text(col("a")),
      F.trigram_similarity(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL registration") {
    F.registerAll(spark)
    val r = spark.sql(
      "SELECT normalize_text('Café & Co') AS n, trigram_similarity('abc', 'abc') AS t").collect()(0)
    assert(r.getString(0) == "cafe and co")
    assert(r.getDouble(1) == 1.0)
  }

  test("GraftExtensions injects the SQL functions at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions = the same GraftExtensions.apply the conf path runs;
    // the `spark.sql.extensions` STRING is resolved from the SparkContext's
    // static conf at context creation, which a shared-JVM test can't rebuild
    val injected = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions().apply(_)).getOrCreate()
    try {
      // no registerAll call — the functions must come from the extension
      // decimal literals — ImplicitCastInputTypes must coerce them
      val r = injected.sql(
        "SELECT normalize_text('Café & Co') AS n, cell_of(48.86, 2.35, 9) AS c," +
          " apex_domain('www.guide.michelin.com') AS a").collect()(0)
      assert(r.getString(0) == "cafe and co")
      assert(r.getString(1).startsWith("h9:"))
      assert(r.getString(2) == "michelin.com")
      // injection survives newSession() — the property temp functions lack
      val r2 = injected.newSession().sql("SELECT trigram_similarity('abc', 'abc') AS t").collect()(0)
      assert(r2.getDouble(0) == 1.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("tag_match_score: eligibility + score in one pass") {
    val df = Seq(
      ("eligible", Seq(("romantic", 0.9), ("wine", 0.8), ("noisy", 0.2))),
      ("excluded", Seq(("romantic", 0.9), ("noisy", 0.9))),
      ("below_min", Seq(("romantic", 0.4))),
      ("no_required", Seq(("brunch", 0.9))))
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, p -> named_struct('tag', p._1, 'confidence', p._2))").as("tags"))
    val scored = df.select(col("id"), F.tag_match_score(
      col("tags"), array(lit("romantic"), lit("wine")), array(lit("noisy")), lit(0.5)).as("s"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(scored("eligible").contains(0.9 + 0.8), "sums matching required confidences")
    assert(scored("excluded").isEmpty, "excluded tag at >= min kills the row")
    assert(scored("below_min").isEmpty, "required below min confidence is no match")
    assert(scored("no_required").isEmpty)
  }

  test("haversine column matches scalar implementation") {
    val df = Seq((48.8566, 2.3522, 45.7640, 4.8357)).toDF("lat1", "lng1", "lat2", "lng2")
    val d = df.select(F.haversine_meters(col("lat1"), col("lng1"), col("lat2"), col("lng2"))).collect()(0).getDouble(0)
    assert(math.abs(d - 391498.93167) < 1e-3)
  }
}
