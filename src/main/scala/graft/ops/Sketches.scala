package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch aggregation — the cardinality side of the approximate
  * toolbox (the ANN ladder covers similarity): HyperLogLog-style distinct
  * counting whose registers live in an ordinary aggregation, so map-side
  * partial aggregation and AQE apply unchanged, plus the MERGE form that
  * combines pre-aggregated per-day sketches — the shape a 100 TB pipeline
  * actually runs (sketch once per ingest slice, fold slices at query time
  * instead of re-reading history; same incremental contract as
  * [[Temporal.snScd2Merge]]).
  *
  * Exact cross-engine replay, by construction:
  *  - the hash is md5-hex (Spark and DuckDB agree on it byte for byte; the
  *    same coin contract as tc_sample_mix/tc_shuffle_shards), parsed with a
  *    generated hex-digit ladder — both dialects' expressions come from the
  *    same generator, only `locate` vs `strpos` argument order differs;
  *  - the leading-zero rank is an integer CASE ladder, no floating log;
  *  - the harmonic term `2^-Mj` is dyadic with Mj ≤ 33, so the register sum
  *    is EXACT in a double no matter the add order — the one place a
  *    float-sum across engines/partitions could diverge, closed by number
  *    theory rather than tolerance.
  * Spark's built-in `approx_count_distinct` is the production default; this
  * operator exists because its sketch is opaque to the oracle — here every
  * register is replayable SQL, and the estimate still lands within HLL's
  * published error (SketchesSpec pins < 15% at m=256; reported beside the
  * exact count).
  */
object Sketches {

  val M = 256 // registers (2 hex digits of the hash)
  /** Standard HLL bias constant α_m for m = 256, embedded as ONE literal in
    * both dialects so the doubles agree bit for bit. */
  val AlphaMM: Double = 0.7213 / (1 + 1.079 / M) * M * M

  private val HexDigits = "0123456789abcdef"

  /** Value of the i-th (1-based) hex digit of `h` — per-dialect only in the
    * substring-search builtin's argument order. */
  private[ops] def hexValSpark(h: String, i: Int): String =
    s"(locate(substring($h, $i, 1), '$HexDigits') - 1)"
  private[ops] def hexValDuck(h: String, i: Int): String =
    s"(strpos('$HexDigits', substring($h, $i, 1)) - 1)"

  /** 32-bit value from hex digits 3..10 (Horner form). The seed is cast to
    * BIGINT so the ×16 chain widens in 64-bit — digit builtins return
    * 32-bit INT in both dialects and 16^8 overflows it. */
  private[ops] def wSql(h: String, hexVal: (String, Int) => String): String =
    (4 to 10).foldLeft(s"CAST(${hexVal(h, 3)} AS BIGINT)") {
      (acc, i) => s"(($acc) * 16 + ${hexVal(h, i)})"
    }

  /** 1-based leading-zero rank of the 32-bit value — an integer CASE
    * ladder, so no cross-engine floating log. */
  private[ops] def rhoSql(w: String): String = {
    val cases = (1 to 32).map(r => s"WHEN $w >= ${1L << (32 - r)} THEN $r").mkString(" ")
    s"(CASE WHEN $w = 0 THEN 33 $cases END)"
  }

  /** Per-row (event_type, day, user_id, bucket, rho) — the sketch input
    * projection, pure codegen'd expressions. Works on a stream unchanged
    * (StreamingSpec runs the register aggregation under the state store and
    * pins parity with the batch registers — max is order-insensitive, so
    * micro-batch boundaries are free). */
  def sketchProjection(events: DataFrame): DataFrame = {
    val hv = hexValSpark _
    events
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .withColumn("h", expr("md5(cast(cast(user_id as string) as binary))"))
      .withColumn("bucket", expr(s"${hv("h", 1)} * 16 + ${hv("h", 2)}").cast("long"))
      // w is projected ONCE and the 33-branch rho ladder references the
      // column — inlining the 8-digit Horner chain into every CASE branch
      // costs ~264 substring/locate calls per row in both dialects.
      .withColumn("w", expr(wSql("h", hv)))
      .withColumn("rho", expr(rhoSql("w")).cast("long"))
      .drop("h", "w")
  }

  def sketchRows(spark: SparkSession, dir: String): DataFrame =
    // fanned (opt guide §2.5): the md5 + Horner hex chain per row otherwise
    // runs on the single-row-group scan task; the register groupBys after
    // it reduce map-side, so the only added cost is a ~2 MB keyed shuffle
    sketchProjection(Tables.fanOut(Tables.events(spark, dir), col("user_id")))

  /** Registers → estimate, with HLL's small-range (linear-counting)
    * correction. `regs` holds (event_type, bucket, mj). */
  private def estimate(spark: SparkSession, dir: String, regs: DataFrame): DataFrame = {
    val agg = regs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets_hit"),
        sum(expr("power(2.0, -mj)")).as("s_hit"))
      .withColumn("v", lit(M.toLong) - col("n_buckets_hit"))
      .withColumn("est_raw", lit(AlphaMM) / (col("s_hit") + col("v")))
      .withColumn("est_hll", round(
        when(col("est_raw") <= lit(2.5 * M) && col("v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("v")))
          .otherwise(col("est_raw")), 4))
    val exact = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(agg, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("n_buckets_hit"), col("est_hll"))
  }

  /** Whole-log sketch: one register set per event_type. */
  def skHllDistinct(spark: SparkSession, dir: String): DataFrame =
    estimate(spark, dir, sketchRows(spark, dir)
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("mj")))

  /** MERGE form: per-day register sets folded by bucket-wise max — register
    * merge is associative/commutative, so the declared oracle is the DIRECT
    * sketch's SQL and the driver's hash gate itself proves merge ≡ direct. */
  def skHllMerge(spark: SparkSession, dir: String): DataFrame =
    estimate(spark, dir, sketchRows(spark, dir)
      .groupBy(col("event_type"), col("day"), col("bucket")).agg(max(col("rho")).as("mj_d"))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("mj_d")).as("mj")))

  // ------------------------------------------------ histogram quantiles

  val BinW = 500L // fixed-width price bins (~1000 bins over the domain)
  val Quantiles = Seq("p50" -> 0.50, "p95" -> 0.95, "p99" -> 0.99)

  /** HISTOGRAM-SKETCH QUANTILES — the mergeable alternative to a global
    * sort: fixed-width bins (the bin id is exact integer arithmetic, so
    * partial counts merge with no float hazard), one running sum over the
    * ≤ |domain|/BinW bins per group, and each quantile reads the upper
    * edge of the first bin whose cumulative count reaches ceil(q·n). Error
    * is bounded by one bin width BY CONSTRUCTION (SketchesSpec pins it
    * against the exact percentile). At 100 TB this is the shape quantile
    * jobs actually run: the scan reduces to (group, bin) counts map-side;
    * only bounded histograms shuffle — t-digest/GK give tighter error but
    * float-order-sensitive merges, which would break the exact oracle. */
  def skHistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") / BinW).cast("long").as("bin"))
      .groupBy(col("o_orderpriority"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("o_orderpriority"))))
    val qCols = Quantiles.map { case (name, q) =>
      min(when(col("cum") >= ceil(col("total") * q), (col("bin") + 1) * BinW))
        .as(s"${name}_est")
    }
    cum.groupBy(col("o_orderpriority"))
      .agg(max(col("total")).as("n_rows"), qCols: _*)
  }

  // ------------------------------------------------------- bloom membership

  val BloomBits = 4096  // m: 128 words × 32 used bits
  val BloomHashes = 3   // k: three independent 12-bit slices of the md5

  /** BLOOM-FILTER MEMBERSHIP — the "seen before?" primitive behind
    * decontamination and incremental-ingest gates at 100 TB: the seen-set
    * compresses to m bits that BUILD as an ordinary `bit_or` aggregate
    * (mergeable across slices by construction) and PROBE through a
    * broadcast equi-join on the word index — no driver round-trip, no
    * nested loop. Here the seen-set is the BUILDING market segment and the
    * probe is every customer, so the output exposes both bloom guarantees
    * at once: zero false negatives on the build segment, and a measured
    * false-positive count on the rest (SketchesSpec pins no-FN exactness
    * and the FP envelope). Word capacity is 32 bits deliberately: DuckDB
    * raises on `1::BIGINT << 63` where Spark wraps silently, so positions
    * stay ≤ 31 and the two engines agree bit for bit. */
  def skBloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val hv = hexValSpark _
    def slice(h: String, start: Int): String =
      s"((${hv(h, start)} * 16 + ${hv(h, start + 1)}) * 16 + ${hv(h, start + 2)})"
    val hashed = Tables.fanOut(Tables.customer(spark, dir), col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("h", expr("md5(cast(cast(c_custkey as string) as binary))"))
      .withColumn("v", explode(array(
        expr(slice("h", 1)), expr(slice("h", 4)), expr(slice("h", 7)))))
      .withColumn("widx", expr("v div 32")).withColumn("pos", expr("v % 32"))
      .drop("h", "v")
    val words = hashed.filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("widx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos as int)))").as("word"))
    hashed.join(broadcast(words), Seq("widx"), "left")
      .withColumn("hit",
        expr("coalesce(shiftright(word, cast(pos as int)) & 1, 0)"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(min(col("hit")).as("member")) // 1 iff all k bits present
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("member")).as("n_flagged"))
  }

  // ------------------------------------------------ HLL set algebra

  /** HLL SET ALGEBRA — the sketch-union/intersection move (Theta-sketch
    * style, via inclusion–exclusion): the 1995 and 2001 customer sets
    * sketch independently, their UNION is the bucket-wise max of the two
    * register sets (exact, by the merge property), and the intersection
    * estimates as est(A) + est(B) − est(A∪B). The whole query is
    * register dataflow — per-set registers, one more max-merge, three
    * estimator rows folded by conditional aggregation — and the exact
    * overlap rides along from a per-customer flag aggregate so the
    * estimate's error is measurable in the output (SketchesSpec pins the
    * inclusion–exclusion identity and the error envelope). */
  def skHllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val hv = hexValSpark _
    val flags = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(when(year(col("o_orderdate")) === 1995, 1).otherwise(0)).as("a"),
        max(when(year(col("o_orderdate")) === 2001, 1).otherwise(0)).as("b"))
    val rows = flags.filter(col("a") === 1 || col("b") === 1)
      .withColumn("h", expr("md5(cast(cast(o_custkey as string) as binary))"))
      .withColumn("bucket", expr(s"${hv("h", 1)} * 16 + ${hv("h", 2)}").cast("long"))
      .withColumn("w", expr(wSql("h", hv)))
      .withColumn("rho", expr(rhoSql("w")).cast("long"))
      .select(col("a"), col("b"), col("bucket"), col("rho"))
    def regs(grp: String, cond: org.apache.spark.sql.Column) = rows.filter(cond)
      .groupBy(col("bucket")).agg(max(col("rho")).as("mj"))
      .withColumn("grp", lit(grp))
    val allRegs = regs("a", col("a") === 1)
      .unionByName(regs("b", col("b") === 1))
      .unionByName(regs("u", lit(true)))
    val ests = allRegs.groupBy(col("grp"))
      .agg(count(lit(1)).as("nb"), sum(expr("power(2.0, -mj)")).as("s_hit"))
      .withColumn("v", lit(M.toLong) - col("nb"))
      .withColumn("est_raw", lit(AlphaMM) / (col("s_hit") + col("v")))
      .withColumn("est", round(
        when(col("est_raw") <= lit(2.5 * M) && col("v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("v")))
          .otherwise(col("est_raw")), 4))
      .groupBy()
      .agg(max(when(col("grp") === "a", col("est"))).as("est_a"),
        max(when(col("grp") === "b", col("est"))).as("est_b"),
        max(when(col("grp") === "u", col("est"))).as("est_union"))
      .withColumn("est_intersect", round(col("est_a") + col("est_b") - col("est_union"), 4))
    val exact = flags.agg(sum(col("a")).cast("long").as("n_a_exact"),
      sum(col("b")).cast("long").as("n_b_exact"),
      sum(col("a") * col("b")).cast("long").as("n_intersect_exact"))
    exact.crossJoin(broadcast(ests))
  }

  // ------------------------------------------------ count-min heavy hitters

  val CmsW = 4096 // buckets per hash row (3 hex digits)
  val CmsD = 4    // hash rows: disjoint 3-digit slices of ONE md5
  val CmsTopK = 20

  /** COUNT-MIN SKETCH HEAVY HITTERS — the frequency side of the approximate
    * toolbox (HLL = how many distinct, histogram = where in the domain,
    * bloom = seen before, CMS = how often). The sketch is d×W = 16384 cells
    * regardless of corpus size: each token increments one bucket per hash
    * row, the build is an ordinary `groupBy(j, bucket).count` (map-side
    * partial, mergeable across ingest slices by construction — fold slices
    * by cell-wise SUM, the same incremental contract as the HLL registers),
    * and a point estimate is min over the d cells, which can only
    * OVERcount (collisions add, never subtract). At 100 TB the scan
    * reduces to 16 k cells map-side; only the fixed-size sketch shuffles.
    * The output sets the estimate beside the exact count for the exact
    * top-K tokens, so the one-sided error guarantee is measurable in the
    * result (SketchesSpec pins est ≥ exact and the ε·N envelope). Hash
    * rows are disjoint hex slices of one md5 — same replayable-coin
    * contract as the bloom probe. */
  def skCmsHeavy(spark: SparkSession, dir: String): DataFrame = {
    val hv = hexValSpark _
    def slice(h: String, start: Int): String =
      s"((${hv(h, start)} * 16 + ${hv(h, start + 1)}) * 16 + ${hv(h, start + 2)})"
    def bucketCols = (0 until CmsD).map(j => expr(slice("h", 1 + 3 * j)).cast("long"))
    val toks = Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val sketch = toks
      .withColumn("h", expr("md5(cast(word as binary))"))
      .select(posexplode(array(bucketCols: _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))
    val exactTop = toks.groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("word").asc).limit(CmsTopK)
    val cand = exactTop
      .withColumn("h", expr("md5(cast(word as binary))"))
      .select(col("word"), col("n_exact"),
        posexplode(array(bucketCols: _*)).as(Seq("j", "bucket")))
    sketch.join(broadcast(cand), Seq("j", "bucket"))
      .groupBy(col("word"), col("n_exact")).agg(min(col("c")).as("n_cms"))
      .select(col("word"), col("n_exact"), col("n_cms"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "sk_hll_distinct" -> (skHllDistinct _),
    "sk_hll_merge" -> (skHllMerge _),
    "sk_hist_quantiles" -> (skHistQuantiles _),
    "sk_bloom_probe" -> (skBloomProbe _),
    "sk_cms_heavy" -> (skCmsHeavy _),
    "sk_hll_intersect" -> (skHllIntersect _))

  private val hllSql: String = {
    val hv = hexValDuck _
    s"""WITH hh AS (
       |  SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
       |  FROM events),
       |hw AS (
       |  SELECT event_type,
       |    ${hv("h", 1)} * 16 + ${hv("h", 2)} AS bucket,
       |    ${wSql("h", hv)} AS w
       |  FROM hh),
       |rows0 AS (
       |  SELECT event_type, bucket, ${rhoSql("w")} AS rho
       |  FROM hw),
       |regs AS (
       |  SELECT event_type, bucket, max(rho) AS mj
       |  FROM rows0 GROUP BY event_type, bucket),
       |agg AS (
       |  SELECT event_type, count(*) AS nb, sum(power(2.0, -mj)) AS s_hit
       |  FROM regs GROUP BY event_type),
       |est AS (
       |  SELECT event_type, nb, ($M - nb) AS v,
       |    $AlphaMM / (s_hit + ($M - nb)) AS est_raw
       |  FROM agg),
       |ex AS (
       |  SELECT event_type, count(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY event_type)
       |SELECT ex.event_type, ex.n_exact,
       |  CAST(est.nb AS BIGINT) AS n_buckets_hit,
       |  CAST(round(CASE WHEN est.est_raw <= ${2.5 * M} AND est.v > 0
       |    THEN ${M.toDouble} * ln(${M.toDouble} / est.v)
       |    ELSE est.est_raw END, 4) AS DOUBLE) AS est_hll
       |FROM ex JOIN est USING (event_type)""".stripMargin
  }

  private val histQSql: String = {
    val qSelects = Quantiles.map { case (name, q) =>
      s"  CAST(min(CASE WHEN cum >= ceil(total * $q) " +
        s"THEN (bin + 1) * $BinW END) AS BIGINT) AS ${name}_est"
    }.mkString(",\n")
    s"""WITH hist AS (
       |  SELECT o_orderpriority,
       |    CAST(floor(o_totalprice / $BinW) AS BIGINT) AS bin, count(*) AS cnt
       |  FROM orders GROUP BY o_orderpriority, bin),
       |cum AS (
       |  SELECT o_orderpriority, bin, cnt,
       |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin ASC
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS total
       |  FROM hist)
       |SELECT o_orderpriority, CAST(max(total) AS BIGINT) AS n_rows,
       |$qSelects
       |FROM cum GROUP BY o_orderpriority""".stripMargin
  }

  private val bloomSql: String = {
    val hv = hexValDuck _
    def slice(h: String, start: Int): String =
      s"((${hv(h, start)} * 16 + ${hv(h, start + 1)}) * 16 + ${hv(h, start + 2)})"
    s"""WITH ch AS (
       |  SELECT c_custkey, c_mktsegment, md5(CAST(c_custkey AS VARCHAR)) AS h
       |  FROM customer),
       |hv AS (
       |  SELECT c_custkey, c_mktsegment, ${slice("h", 1)} AS v FROM ch
       |  UNION ALL
       |  SELECT c_custkey, c_mktsegment, ${slice("h", 4)} AS v FROM ch
       |  UNION ALL
       |  SELECT c_custkey, c_mktsegment, ${slice("h", 7)} AS v FROM ch),
       |hashed AS (
       |  SELECT c_custkey, c_mktsegment, v // 32 AS widx, v % 32 AS pos FROM hv),
       |words AS (
       |  SELECT widx, bit_or(CAST(1 AS BIGINT) << CAST(pos AS INT)) AS word
       |  FROM hashed WHERE c_mktsegment = 'BUILDING' GROUP BY widx),
       |probed AS (
       |  SELECT c_custkey, c_mktsegment,
       |    min(CASE WHEN ((COALESCE(word, 0) >> CAST(pos AS INT)) & 1) = 1
       |             THEN 1 ELSE 0 END) AS member
       |  FROM hashed LEFT JOIN words USING (widx)
       |  GROUP BY c_custkey, c_mktsegment)
       |SELECT c_mktsegment, count(*) AS n_customers,
       |  CAST(sum(member) AS BIGINT) AS n_flagged
       |FROM probed GROUP BY c_mktsegment""".stripMargin
  }

  private val cmsSql: String = {
    val hv = hexValDuck _
    def slice(h: String, start: Int): String =
      s"((${hv(h, start)} * 16 + ${hv(h, start + 1)}) * 16 + ${hv(h, start + 2)})"
    val buildArms = (0 until CmsD).map(j =>
      s"SELECT $j AS j, ${slice("h", 1 + 3 * j)} AS bucket FROM tw").mkString("\n  UNION ALL ")
    val candArms = (0 until CmsD).map(j =>
      s"SELECT word, n_exact, $j AS j, ${slice("h", 1 + 3 * j)} AS bucket FROM candh")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS word
       |  FROM documents),
       |tw AS (SELECT word, md5(word) AS h FROM toks WHERE len(word) > 0),
       |bkts AS (
       |  $buildArms),
       |sketch AS (SELECT j, bucket, count(*) AS c FROM bkts GROUP BY j, bucket),
       |exact AS (
       |  SELECT word, count(*) AS n_exact FROM toks WHERE len(word) > 0
       |  GROUP BY word ORDER BY n_exact DESC, word LIMIT $CmsTopK),
       |candh AS (SELECT word, n_exact, md5(word) AS h FROM exact),
       |cand AS (
       |  $candArms)
       |SELECT word, n_exact, min(c) AS n_cms
       |FROM cand JOIN sketch USING (j, bucket)
       |GROUP BY word, n_exact""".stripMargin
  }

  private val hllIntersectSql: String = {
    val hv = hexValDuck _
    s"""WITH flags AS MATERIALIZED (
       |  SELECT o_custkey,
       |    max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS a,
       |    max(CASE WHEN year(o_orderdate) = 2001 THEN 1 ELSE 0 END) AS b
       |  FROM orders GROUP BY o_custkey),
       |hw AS MATERIALIZED (
       |  SELECT a, b,
       |    ${hv("h", 1)} * 16 + ${hv("h", 2)} AS bucket,
       |    ${wSql("h", hv)} AS w
       |  FROM (SELECT a, b, md5(CAST(o_custkey AS VARCHAR)) AS h
       |        FROM flags WHERE a = 1 OR b = 1)),
       |rows0 AS MATERIALIZED (
       |  SELECT a, b, bucket, ${rhoSql("w")} AS rho FROM hw),
       |regs AS MATERIALIZED (
       |  SELECT 'a' AS grp, bucket, max(rho) AS mj FROM rows0 WHERE a = 1 GROUP BY bucket
       |  UNION ALL
       |  SELECT 'b', bucket, max(rho) FROM rows0 WHERE b = 1 GROUP BY bucket
       |  UNION ALL
       |  SELECT 'u', bucket, max(rho) FROM rows0 GROUP BY bucket),
       |est0 AS MATERIALIZED (
       |  SELECT grp, count(*) AS nb, sum(power(2.0, -mj)) AS s_hit
       |  FROM regs GROUP BY grp),
       |est1 AS MATERIALIZED (
       |  SELECT grp, ($M - nb) AS v, $AlphaMM / (s_hit + ($M - nb)) AS est_raw
       |  FROM est0),
       |ests AS MATERIALIZED (
       |  SELECT
       |    max(CASE WHEN grp = 'a' THEN est END) AS est_a,
       |    max(CASE WHEN grp = 'b' THEN est END) AS est_b,
       |    max(CASE WHEN grp = 'u' THEN est END) AS est_union
       |  FROM (SELECT grp, CAST(round(CASE WHEN est_raw <= ${2.5 * M} AND v > 0
       |          THEN ${M.toDouble} * ln(${M.toDouble} / v)
       |          ELSE est_raw END, 4) AS DOUBLE) AS est FROM est1)),
       |exact AS MATERIALIZED (
       |  SELECT CAST(sum(a) AS BIGINT) AS n_a_exact,
       |    CAST(sum(b) AS BIGINT) AS n_b_exact,
       |    CAST(sum(a * b) AS BIGINT) AS n_intersect_exact
       |  FROM flags)
       |SELECT n_a_exact, n_b_exact, n_intersect_exact, est_a, est_b, est_union,
       |  round(est_a + est_b - est_union, 4) AS est_intersect
       |FROM exact CROSS JOIN ests""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sk_hll_intersect" -> hllIntersectSql,
    "sk_hll_distinct" -> hllSql,
    "sk_hll_merge" -> hllSql,
    "sk_hist_quantiles" -> histQSql,
    "sk_bloom_probe" -> bloomSql,
    "sk_cms_heavy" -> cmsSql)
}
