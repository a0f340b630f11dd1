package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal snapshot / interval operators over the event log — the warehouse
  * moves a training-data pipeline needs around "what was true at time t":
  * building SCD2 validity intervals from a change stream, point-in-time
  * snapshots (the leakage-safe feature-lookup primitive), and a scale-safe
  * interval-overlap join. Companions to the as-of join
  * ([[Joins.jAsofEvents]]) — as-of answers "latest left row per right row",
  * these answer "state history", "state at t", and "which intervals meet".
  *
  * Scale notes (100 TB north star): SCD2 is ONE shuffle on the entity key —
  * the run-break window, the run aggregate, and the interval-chaining window
  * all share the user_id partitioning, so Catalyst reuses the exchange. The
  * snapshot is a map-side-combinable max(struct) aggregate, NOT a window —
  * no per-key sort, partial aggregation thins every map task before the
  * exchange. The overlap join never materializes non-candidate pairs: each
  * interval explodes into the (bounded: interval_len/bucket + 1) time buckets
  * it covers and pairs meet through a plain shuffle equi-join on the bucket —
  * per-bucket density bounds the intermediate, a viral hour is an ordinary
  * skewed shuffle partition that AQE's OptimizeSkewedJoin splits (pinned for
  * this join family by SkewJoinSpec), and each pair is emitted EXACTLY once
  * (in the bucket of its overlap start) so no distinct pass is needed.
  */
object Temporal {

  /** Gap threshold splitting a user's event run into sessions (micros). */
  val SessionGapUs: Long = 30L * 60 * 1000000
  /** Overlap-join time bucket width (micros): one hour. */
  val BucketUs: Long = 3600L * 1000000
  /** The snapshot instant for [[snPitSnapshot]] (mid-range of the 30-day log). */
  val PitAsOf = "2024-01-15 12:00:00"

  /** Run-compression kernel shared by the full build and the incremental
    * merge: weighted change events (user_id, ts, event_id, event_type,
    * weight) → intervals (user_id, version from 1, state, vf, vt — null =
    * open, n_events = run weight sum). One shuffle on user_id shared by
    * both windows and the run aggregate. */
  private def intervals(events: DataFrame): DataFrame = {
    val w0 = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val brk = when(lag(col("event_type"), 1).over(w0).isNull ||
      lag(col("event_type"), 1).over(w0) =!= col("event_type"), lit(1L)).otherwise(lit(0L))
    val runs = events
      .withColumn("version", sum(brk).over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"), // constant within a run
        min(col("ts")).as("vf"), sum(col("weight")).as("n_events"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version").asc)
    runs.withColumn("vt", lead(col("vf"), 1).over(wv))
  }

  /** The driver-facing interval shape (micros + current flag). */
  private def formatIntervals(iv: DataFrame): DataFrame =
    iv.select(col("user_id"), col("version"), col("state"),
      unix_micros(col("vf")).as("valid_from_us"),
      unix_micros(col("vt")).as("valid_to_us"),
      col("n_events"), col("vt").isNull.as("is_current"))

  private def changeLog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lit(1L).as("weight"))

  /** SCD2 (type-2 slowly-changing dimension) VALIDITY INTERVALS from the raw
    * change log: per user, consecutive events with the same event_type are
    * change-compressed into one run, and each run becomes a versioned
    * interval [valid_from, valid_to) whose valid_to is the next run's start
    * (NULL = current). The canonical "dimension history from a CDC stream"
    * build: deterministic under the (ts, event_id) total order. */
  def snScd2Intervals(spark: SparkSession, dir: String): DataFrame =
    formatIntervals(intervals(changeLog(spark, dir)))

  /** Split instant for [[snScd2Merge]]'s base/delta halves. */
  val MergeSplit = "2024-01-20 00:00:00"

  /** INCREMENTAL SCD2 MERGE — fold a new slice of the change log into an
    * already-built interval table without recomputing history: closed
    * intervals pass through untouched; each key's OPEN interval re-enters
    * the run compressor as ONE weighted seed pseudo-event (event_id -1 so
    * it sorts first; weight = its accumulated n_events, so a delta run that
    * continues the open state extends it seamlessly), and recompressed
    * versions are offset by the key's prior version count. The recompute
    * touches |keys| + |delta| rows — never the base history — which is the
    * nightly-dim-maintenance shape at 100 TB: partition the interval table
    * on the key, rewrite only touched partitions, swap via AtomicTable.
    * The declared oracle is the FULL REBUILD's SQL, so the driver's hash
    * gate itself proves merge ≡ rebuild; TemporalSpec adds the degenerate
    * splits (all-base, all-delta). */
  def snScd2Merge(spark: SparkSession, dir: String): DataFrame =
    formatIntervals(scd2Merge(
      changeLog(spark, dir).filter(col("ts") < lit(MergeSplit).cast("timestamp")),
      changeLog(spark, dir).filter(col("ts") >= lit(MergeSplit).cast("timestamp"))))

  /** The merge kernel over weighted change logs (see [[snScd2Merge]]). */
  def scd2Merge(base: DataFrame, delta: DataFrame): DataFrame = {
    val oldIv = intervals(base)
    val closed = oldIv.filter(col("vt").isNotNull)
    val open = oldIv.filter(col("vt").isNull)
    val seed = open.select(col("user_id"), col("vf").as("ts"),
      lit(-1L).as("event_id"), col("state").as("event_type"),
      col("n_events").as("weight"))
    val re = intervals(seed.unionByName(delta))
    val offsets = open.select(col("user_id"), (col("version") - 1).as("voff"))
    val reOff = re.join(offsets, Seq("user_id"), "left")
      .withColumn("version", col("version") + coalesce(col("voff"), lit(0L)))
      .select(closed.columns.map(col).toIndexedSeq: _*)
    closed.unionByName(reOff)
  }

  /** POINT-IN-TIME SNAPSHOT — every user's state as of [[PitAsOf]], the
    * leakage-safe feature-store lookup ("no information from after t"). NOT
    * a window: the latest at-or-before row per key is a map-side-combinable
    * `max(struct(ts, event_id, ...))` aggregate over the time-filtered scan,
    * so partial aggregation collapses each map task to one row per user
    * before the only shuffle, and the time filter is pushed to the scan. */
  def snPitSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val asOf = lit(PitAsOf).cast("timestamp")
    Tables.events(spark, dir)
      .filter(col("ts") <= asOf)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("state"),
        col("m.event_id").as("last_event_id"),
        (unix_micros(asOf) - unix_micros(col("m.ts"))).as("staleness_us"))
  }

  /** Per-user gap sessions as intervals (shared by the overlap join and its
    * parity spec): a new session starts after [[SessionGapUs]] of silence. */
  def sessionIntervals(events: DataFrame): DataFrame = {
    val w0 = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w0))
    val brk = when(gap.isNull || gap > lit(SessionGapUs), lit(1L)).otherwise(lit(0L))
    events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("sid", sum(brk).over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"), count(lit(1)).as("n_events"))
  }

  /** W10 — batch gap SESSIONIZATION as a first-class query (the batch twin
    * of the streaming session windows, and the interval source of
    * [[jIntervalOverlap]]): one shuffle on the session key, the break
    * window and the session aggregate share it. */
  def w10GapSessions(spark: SparkSession, dir: String): DataFrame =
    sessionIntervals(Tables.events(spark, dir))
      .select(col("user_id"), col("sid"),
        unix_micros(col("s")).as("start_us"),
        (unix_micros(col("e")) - unix_micros(col("s"))).as("duration_us"),
        col("n_events"))

  /** INTERVAL-OVERLAP JOIN, bucketed: which pairs of users were active at
    * the same moment (their gap-sessions overlap), aggregated per day. The
    * naive form is a theta join (`a.e >= b.s AND b.e >= a.s`) — a
    * BroadcastNestedLoop/cartesian at scale. Here every session explodes
    * into the hour buckets it covers and candidates meet through a plain
    * shuffle EQUI-join on the bucket; the exact overlap predicate runs as
    * the join residual. Emit-once discipline: a pair qualifies only in the
    * bucket containing its overlap start (`greatest(s,s')`), which lies in
    * both sessions' bucket ranges — so no distinct over the pair relation.
    * TemporalSpec pins result parity with the naive theta form and the
    * absence of any nested-loop/cartesian operator in this plan. */
  def jIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val iv = sessionIntervals(Tables.events(spark, dir))
    val exploded = iv
      .select(col("user_id"), unix_micros(col("s")).as("s_us"), unix_micros(col("e")).as("e_us"))
      .withColumn("bucket",
        explode(sequence(expr(s"s_us div $BucketUs"), expr(s"e_us div $BucketUs"))))
      // staged (lazy localCheckpoint, r21): both self-join sides consume the
      // bucketed relation, and their differing aliases defeat exchange reuse
      // — uncut, each side re-runs the whole sessionization window chain
      .localCheckpoint(false)
    val a = exploded.select(col("bucket").as("bk1"), col("user_id").as("u1"),
      col("s_us").as("s1"), col("e_us").as("e1"))
    val b = exploded.select(col("bucket").as("bk2"), col("user_id").as("u2"),
      col("s_us").as("s2"), col("e_us").as("e2"))
    a.join(b, col("bk1") === col("bk2"), "inner")
      .filter(col("u1") < col("u2") &&
        col("e1") >= col("s2") && col("e2") >= col("s1"))
      .withColumn("ov_start", greatest(col("s1"), col("s2")))
      .filter(expr(s"ov_start div $BucketUs") === col("bk1"))
      .groupBy(from_unixtime(expr("ov_start div 1000000"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e1"), col("e2")) - col("ov_start")).as("overlap_us"))
  }

  /** Day length in micros and the fixed horizon closing open intervals for
    * [[snStateTimeline]] (first midnight after the 30-day log). */
  val DayUs: Long = 86400L * 1000000
  val TimelineEndDay: Long = 19753 // 2024-01-31 UTC midnight, days since epoch

  /** STATE TIMELINE — the daily rollup a dimension history exists to
    * answer ("how many users were in state X at each midnight"): every
    * SCD2 interval explodes into the UTC midnights it covers (bounded by
    * interval length in days — no day×user grid is ever materialized) and
    * a plain count per (day, state) falls out, exact because intervals
    * tile each user's history (at most one interval covers any instant).
    * Same bounded-explode discipline as [[jIntervalOverlap]]'s buckets. */
  def snStateTimeline(spark: SparkSession, dir: String): DataFrame = {
    val iv = intervals(changeLog(spark, dir))
    iv.select(col("state"),
        unix_micros(col("vf")).as("vf_us"),
        coalesce(unix_micros(col("vt")), lit((TimelineEndDay + 1) * DayUs)).as("vt_us"))
      // midnights m with vf <= m*Day < vt
      .withColumn("d0", expr(s"(vf_us + ${DayUs - 1}) div $DayUs"))
      .withColumn("d1", least(expr(s"(vt_us - 1) div $DayUs"), lit(TimelineEndDay)))
      .filter(col("d0") <= col("d1"))
      .withColumn("day_idx", explode(sequence(col("d0"), col("d1"))))
      .groupBy(col("day_idx"), col("state"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** INCREMENTAL VIEW MAINTENANCE for algebraic aggregates — the batch
    * sibling of [[snScd2Merge]]'s touched-rows contract: a materialized
    * revenue view stores PARTIALS (sum, count, max — each map-side
    * combinable), the nightly delta slice folds in as one more partial
    * union + re-aggregate, and derived values (avg) are computed only at
    * read time from the merged partials. The declared oracle is the FULL
    * REBUILD over all orders, so the driver's hash gate itself proves
    * merge ≡ rebuild every round — maintaining the view never re-reads
    * base history, only |groups| + |delta| rows. */
  val IvCutoff = "2000-01-01"
  def ivRevenueMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // Exact integer-cents partials (Relational.centsSum's contract): each
    // price quantizes to BIGINT cents, so a partial is a long sum, merging
    // two partials is long addition — bit-identical to the oracle's single
    // sequential sum at any partitioning/SF (a raw double sum is
    // partition-order dependent and only matched the oracle's 4th decimal
    // by luck; the interim DECIMAL form was exact but ~4x slower). Derived
    // values divide the exact cents once, in the same operation order as
    // the oracle.
    def partials(df: DataFrame) = df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.ops.Relational.quantize(col("o_totalprice"), 2)).as("sum_c"),
        max(col("o_totalprice")).as("max_p"))
    val base = partials(o.filter(col("o_orderdate") < lit(IvCutoff).cast("date")))
    val delta = partials(o.filter(col("o_orderdate") >= lit(IvCutoff).cast("date")))
    base.unionByName(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("sum_c")).as("sum_c"),
        max(col("max_p")).as("max_p"))
      .select(col("o_orderpriority"), col("n_orders"),
        round(col("sum_c") / lit(100.0), 4).as("sum_price"),
        round(col("sum_c") / lit(100.0) / col("n_orders"), 4).as("avg_price"),
        round(col("max_p"), 4).as("max_price"))
  }

  /** Snapshot instants and the activity window for [[snSnapshotDiff]]: a
    * user is IN the snapshot at t iff they have an event in (t-1d, t]; the
    * 1-day window makes all four diff classes (added/removed/changed/
    * unchanged) non-degenerate at every SF (a 7-day window captures every
    * user at the log's event rate and the added/removed classes vanish). */
  val DiffT1 = "2024-01-15 00:00:00"
  val DiffT2 = "2024-01-22 00:00:00"
  val SnapWindowUs: Long = DayUs

  /** Activity snapshot at `at`: per active user, last state (total-ordered
    * by (ts, event_id) via one map-side-combinable max(struct)) + event
    * count in the window. Same aggregate shape as [[snPitSnapshot]]. */
  private def activitySnapshot(events: DataFrame, at: String): DataFrame = {
    val tUs = unix_micros(lit(at).cast("timestamp")) // constant-folded
    events
      .filter(unix_micros(col("ts")) <= tUs &&
        unix_micros(col("ts")) > tUs - lit(SnapWindowUs))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("m.event_type").as("state"), col("n_events"))
  }

  /** TABLE DIFF kernel — reconcile two snapshot versions of a keyed table
    * into row-level change records: `added` (key only in new), `removed`
    * (key only in old), `changed` (key in both, any compared column
    * differs, with the differing-column count), `unchanged`. The shape a
    * lakehouse needs for snapshot audits, CDC backfills and
    * rebuild-vs-incremental reconciliation. ONE full-outer shuffle
    * equi-join on the key and a row-local classification — no window, no
    * driver loop; at 100 TB both snapshot versions live bucketed by the
    * key (sources/BucketedTables' layout), so the join plans with zero
    * exchanges and the diff streams straight to its sink. */
  def snapshotDiff(oldS: DataFrame, newS: DataFrame, key: String): DataFrame = {
    val o = oldS.select(col(key).as("k1"),
      col("state").as("old_state"), col("n_events").as("old_n"))
    val n = newS.select(col(key).as("k2"),
      col("state").as("new_state"), col("n_events").as("new_n"))
    o.join(n, col("k1") === col("k2"), "full_outer")
      .select(
        coalesce(col("k1"), col("k2")).as(key),
        when(col("old_n").isNull, "added")
          .when(col("new_n").isNull, "removed")
          .when(col("old_state") =!= col("new_state") ||
            col("old_n") =!= col("new_n"), "changed")
          .otherwise("unchanged").as("change"),
        col("old_state"), col("new_state"), col("old_n"), col("new_n"),
        when(col("old_n").isNull || col("new_n").isNull, lit(null).cast("long"))
          .otherwise(
            when(col("old_state") =!= col("new_state"), 1L).otherwise(0L) +
              when(col("old_n") =!= col("new_n"), 1L).otherwise(0L))
          .as("n_cols_changed"))
  }

  /** SNAPSHOT DIFF between the [[DiffT1]] and [[DiffT2]] activity
    * snapshots — who entered, left, or changed shape week over week. */
  def snSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    snapshotDiff(activitySnapshot(ev, DiffT1), activitySnapshot(ev, DiffT2),
      "user_id")
  }

  val queries: Map[String, Relational.Q] = Map(
    "iv_revenue_merge" -> (ivRevenueMerge _),
    "sn_snapshot_diff" -> (snSnapshotDiff _),
    "sn_scd2_intervals" -> (snScd2Intervals _),
    "sn_scd2_merge" -> (snScd2Merge _),
    "sn_pit_snapshot" -> (snPitSnapshot _),
    "sn_state_timeline" -> (snStateTimeline _),
    "w10_gap_sessions" -> (w10GapSessions _),
    "j_interval_overlap" -> (jIntervalOverlap _))

  /** Sessionization CTEs shared by the overlap oracle (DuckDB replay of
    * [[sessionIntervals]]). */
  private val sessionCtesSql: String =
    s"""ord AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(CAST(ts AS TIMESTAMP))
       |              - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > $SessionGapUs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |sess AS (
       |  SELECT user_id, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM ord),
       |iv AS (
       |  SELECT user_id, sid, min(ts) AS s, max(ts) AS e, count(*) AS n_events
       |  FROM sess GROUP BY user_id, sid)""".stripMargin

  /** Run-compression CTEs shared by the rebuild/merge oracle and the
    * state-timeline oracle (DuckDB replay of [[intervals]]). */
  private val scd2CtesSql: String =
    """ord AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |runs0 AS (
      |  SELECT user_id, event_type, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                   ROWS UNBOUNDED PRECEDING) AS version
      |  FROM ord),
      |runs AS (
      |  SELECT user_id, version, min(event_type) AS state, min(ts) AS vf,
      |    count(*) AS n_events
      |  FROM runs0 GROUP BY user_id, version)""".stripMargin

  /** Full-rebuild replay — also the oracle of `sn_scd2_merge`, so the
    * driver's hash gate itself proves the incremental merge ≡ rebuild. */
  private val scd2RebuildSql: String =
    s"""WITH $scd2CtesSql
        |SELECT user_id, CAST(version AS BIGINT) AS version, state,
        |  epoch_us(CAST(vf AS TIMESTAMP)) AS valid_from_us,
        |  epoch_us(CAST(lead(vf) OVER wv AS TIMESTAMP)) AS valid_to_us,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  lead(vf) OVER wv IS NULL AS is_current
        |FROM runs
        |WINDOW wv AS (PARTITION BY user_id ORDER BY version ASC)""".stripMargin

  /** One activity-snapshot CTE body (DuckDB replay of [[activitySnapshot]]). */
  private def snapCteSql(at: String): String =
    s"""  SELECT user_id, event_type AS state,
       |    count(*) OVER (PARTITION BY user_id) AS n_events,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events
       |  WHERE epoch_us(CAST(ts AS TIMESTAMP)) <= epoch_us(TIMESTAMP '$at')
       |    AND epoch_us(CAST(ts AS TIMESTAMP))
       |        > epoch_us(TIMESTAMP '$at') - $SnapWindowUs""".stripMargin

  val oracles: Map[String, String] = Map(
    "sn_snapshot_diff" ->
      s"""WITH s1r AS (
         |${snapCteSql(DiffT1)}),
         |s2r AS (
         |${snapCteSql(DiffT2)}),
         |s1 AS (SELECT user_id, state, CAST(n_events AS BIGINT) AS n_events
         |       FROM s1r WHERE rn = 1),
         |s2 AS (SELECT user_id, state, CAST(n_events AS BIGINT) AS n_events
         |       FROM s2r WHERE rn = 1)
         |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
         |  CASE WHEN s1.n_events IS NULL THEN 'added'
         |       WHEN s2.n_events IS NULL THEN 'removed'
         |       WHEN s1.state <> s2.state OR s1.n_events <> s2.n_events
         |         THEN 'changed'
         |       ELSE 'unchanged' END AS change,
         |  s1.state AS old_state, s2.state AS new_state,
         |  s1.n_events AS old_n, s2.n_events AS new_n,
         |  CASE WHEN s1.n_events IS NULL OR s2.n_events IS NULL
         |         THEN CAST(NULL AS BIGINT)
         |       ELSE (CASE WHEN s1.state <> s2.state THEN 1 ELSE 0 END)
         |          + (CASE WHEN s1.n_events <> s2.n_events THEN 1 ELSE 0 END)
         |       END AS n_cols_changed
         |FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id""".stripMargin,
    "iv_revenue_merge" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
        |  ${graft.ops.Relational.centsSumSql("o_totalprice", 2)} AS sum_price,
        |  round(CAST(sum(CAST(round((o_totalprice) * 100, 0) AS BIGINT)) AS BIGINT)
        |    / CAST(100 AS DOUBLE) / count(*), 4) AS avg_price,
        |  round(max(o_totalprice), 4) AS max_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "sn_scd2_intervals" -> scd2RebuildSql,
    "sn_scd2_merge" -> scd2RebuildSql,
    "sn_state_timeline" ->
      s"""WITH $scd2CtesSql,
         |iv AS (
         |  SELECT user_id, state,
         |    epoch_us(CAST(vf AS TIMESTAMP)) AS vf_us,
         |    COALESCE(epoch_us(CAST(lead(vf) OVER
         |        (PARTITION BY user_id ORDER BY version ASC) AS TIMESTAMP)),
         |      ${(TimelineEndDay + 1) * DayUs}) AS vt_us
         |  FROM runs),
         |ex AS (
         |  SELECT state,
         |    unnest(generate_series((vf_us + ${DayUs - 1}) // $DayUs,
         |      least((vt_us - 1) // $DayUs, $TimelineEndDay))) AS day_idx
         |  FROM iv
         |  WHERE (vf_us + ${DayUs - 1}) // $DayUs
         |    <= least((vt_us - 1) // $DayUs, $TimelineEndDay))
         |SELECT day_idx, state, count(*) AS n_users
         |FROM ex GROUP BY day_idx, state""".stripMargin,
    "sn_pit_snapshot" ->
      s"""WITH f AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events WHERE ts <= TIMESTAMP '$PitAsOf')
         |SELECT user_id, event_type AS state, event_id AS last_event_id,
         |  epoch_us(TIMESTAMP '$PitAsOf') - epoch_us(CAST(ts AS TIMESTAMP)) AS staleness_us
         |FROM f WHERE rn = 1""".stripMargin,
    "w10_gap_sessions" ->
      s"""WITH $sessionCtesSql
         |SELECT user_id, CAST(sid AS BIGINT) AS sid,
         |  epoch_us(CAST(s AS TIMESTAMP)) AS start_us,
         |  epoch_us(CAST(e AS TIMESTAMP)) - epoch_us(CAST(s AS TIMESTAMP)) AS duration_us,
         |  CAST(n_events AS BIGINT) AS n_events
         |FROM iv""".stripMargin,
    "j_interval_overlap" ->
      s"""WITH $sessionCtesSql
         |SELECT strftime(CAST(greatest(a.s, b.s) AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(epoch_us(CAST(least(a.e, b.e) AS TIMESTAMP))
         |    - epoch_us(CAST(greatest(a.s, b.s) AS TIMESTAMP))) AS BIGINT) AS overlap_us
         |FROM iv a JOIN iv b
         |  ON a.user_id < b.user_id AND a.e >= b.s AND b.e >= a.s
         |GROUP BY 1""".stripMargin)
}
