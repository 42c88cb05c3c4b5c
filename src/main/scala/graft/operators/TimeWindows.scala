package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Query
import graft.functions.Exact._
import graft.sources.Tables

/** Event-time windowing in batch: tumbling / sliding windows, classic
  * lag+cumsum sessionization, and Spark's native session_window operator.
  * The streaming twin of the tumbling query lives in
  * [[graft.streaming.StreamingOps]] — same semantics via readStream.
  *
  * Scale notes (100 TB): window assignment (`window()`, `session_window()`)
  * is a per-row expression, so the only shuffle is the groupBy on
  * (window, key) — pre-aggregated map-side. Sessionization shuffles once on
  * `user_id`; at 100 TB a hot user would need salted two-phase
  * sessionization, but the per-user ordering requirement makes user_id the
  * natural partition key.
  */
object TimeWindows {

  /** Tumbling 10-minute windows per event type. */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  private val tumblingOracle =
    s"""SELECT wstart, wstart + INTERVAL '10 minutes' AS wend, event_type,
       | CAST(count(*) AS BIGINT) AS n,
       | ${sqlDsum("value")} AS sum_value
       |FROM (SELECT time_bucket(INTERVAL '10 minutes', ts) AS wstart, event_type, value
       |      FROM events)
       |GROUP BY wstart, event_type
       |ORDER BY wstart, event_type""".stripMargin

  /** Sliding windows: 10-minute length, 5-minute slide — each event lands in
    * two windows. The oracle assigns both containing windows via unnest.
    */
  def sliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        col("window.start").as("wstart"), col("window.end").as("wend"),
        col("n"), col("n_users"))
      .orderBy("wstart")

  private val slidingOracle =
    """SELECT wstart, wstart + INTERVAL '10 minutes' AS wend,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
      |                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
      |        AS wstart,
      |       user_id
      |      FROM events)
      |GROUP BY wstart
      |ORDER BY wstart""".stripMargin

  /** Classic sessionization: lag() gap detection + running-sum session ids,
    * sessions split when the gap is ≥ 30 minutes.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runningFlags = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          .or(col("ts") >= col("prev_ts") + expr("INTERVAL '30' MINUTE")), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(runningFlags))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_seq")
  }

  private val sessionizeOracle =
    """SELECT user_id, session_seq,
      | CAST(count(*) AS BIGINT) AS n_events,
      | min(ts) AS session_start, max(ts) AS session_end
      |FROM (
      | SELECT user_id, ts,
      |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      | FROM (
      |  SELECT user_id, ts, event_id,
      |   CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL '30 minutes'
      |        THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, ts, event_id,
      |         lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |        FROM events)))
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Spark's native session_window operator (gap-merged windows as a
    * first-class grouping expression). Oracle reconstructs the same sessions
    * with lag+cumsum: start = min(ts), end = max(ts) + gap.
    */
  def sessionWindowNative(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  // shared with the streaming twin (stream_session_window): identical
  // output contract, so one oracle gates both
  private[graft] val sessionWindowOracle =
    s"""SELECT user_id,
       | min(ts) AS session_start,
       | max(ts) + INTERVAL '30 minutes' AS session_end,
       | CAST(count(*) AS BIGINT) AS n_events,
       | ${sqlDsum("value")} AS sum_value
       |FROM (
       | SELECT user_id, ts, value,
       |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       | FROM (
       |  SELECT user_id, ts, event_id, value,
       |   CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL '30 minutes'
       |        THEN 1 ELSE 0 END AS new_session
       |  FROM (SELECT user_id, ts, event_id, value,
       |         lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |        FROM events)))
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_start""".stripMargin

  /** Session windows with a DYNAMIC, per-event gap: clicks time out after
    * 10 minutes, everything else after 30 — the per-event-class session
    * policy real products run (short attention events vs long-form
    * activity), expressible only because `session_window` accepts a gap
    * EXPRESSION. Semantics (and the oracle's re-derivation): each event
    * spans [ts, ts+gap); overlapping spans merge, so session membership
    * depends on the RUNNING MAX of previous span ends — a long-gap event
    * can bridge over a short-gap one, which per-previous-event
    * formulations get wrong. Same single (user_id) exchange as the fixed
    * gap variant; the merge runs inside Spark's session-window aggregation
    * node either way.
    */
  def sessionWindowDynamicGap(spark: SparkSession, sfDir: String): DataFrame = {
    val gap = when(col("event_type") === "click", lit("10 minutes"))
      .otherwise(lit("30 minutes"))
    Tables(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  private val sessionWindowDynamicGapOracle =
    s"""WITH g AS (
       |  SELECT user_id, ts, event_id, value,
       |    ts + CASE WHEN event_type = 'click' THEN INTERVAL '10 minutes'
       |              ELSE INTERVAL '30 minutes' END AS ext
       |  FROM events),
       |r AS (
       |  SELECT *, max(ext) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM g),
       |q AS (
       |  SELECT *, CAST(sum(CASE WHEN prev_end IS NULL OR ts >= prev_end
       |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
       |  FROM r)
       |SELECT user_id, min(ts) AS session_start, max(ext) AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  ${sqlDsum("value")} AS sum_value
       |FROM q GROUP BY user_id, seq
       |ORDER BY user_id, session_start""".stripMargin

  /** Ordered-funnel analysis per session — view → click → purchase, each
    * step's timestamp strictly after the previous step's, scoped to a
    * 30-minute-gap session: the product-analytics query every event
    * warehouse runs, and a genuinely SEQUENTIAL pattern (a purchase before
    * the session's first view must not count). Sessions come from the same
    * lag+cumsum assignment as `win_sessionize`; within a session three
    * chained unbounded min-windows find t1 = first view, t2 = first click
    * after t1, t3 = first purchase after t2, and the session's funnel
    * stage is the deepest non-null step.
    *
    * Shape: one user_id exchange + sort for session assignment, one
    * (user_id, session_seq) exchange shared by the three chained
    * min-windows (no sort needed — unbounded frames), then a tiny
    * map-side-combined count by stage. Sub-partitioning by session also
    * caps hot-user window state at session size, which plain per-user
    * funnels don't.
    */
  def funnelStages(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runningFlags =
      byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          .or(col("ts") >= col("prev_ts") + expr("INTERVAL '30' MINUTE")), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(runningFlags))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(bySession))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(bySession))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(bySession))
      .select(col("user_id"), col("session_seq"),
        when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("funnel_stage"))
      .distinct()
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("funnel_stage")
  }

  private val funnelStagesOracle =
    """WITH sess AS (
      |  SELECT user_id, event_type, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |      CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL '30 minutes'
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM (SELECT user_id, ts, event_id, event_type,
      |           lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |             AS prev_ts
      |          FROM events))),
      |s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id, session_seq) AS t1
      |  FROM sess),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
      |    OVER (PARTITION BY user_id, session_seq) AS t2
      |  FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
      |    OVER (PARTITION BY user_id, session_seq) AS t3
      |  FROM s2),
      |stages AS (
      |  SELECT DISTINCT user_id, session_seq,
      |    CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |      AS funnel_stage
      |  FROM s3)
      |SELECT funnel_stage, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM stages GROUP BY funnel_stage ORDER BY funnel_stage""".stripMargin

  /** Forward-fill imputation — carry each user's last observed purchase
    * value forward across their event stream (the gap-filling every
    * time-series feature pipeline needs; events before the first
    * observation stay NULL). The value passes through untouched — no
    * arithmetic — so cross-engine determinism is free.
    *
    * Shape: one user_id exchange + per-user time sort, then a running
    * last(ignoreNulls) frame — the same single-shuffle profile as
    * sessionization, and at 100 TB the partition key would extend to
    * (user_id, day) with the previous day's closing value joined in, which
    * bounds any one partition's sort.
    */
  def fillForward(spark: SparkSession, sfDir: String): DataFrame = {
    val running = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "purchase", col("value")).as("observed"),
        col("ts"))
      .withColumn("filled",
        last(col("observed"), ignoreNulls = true).over(running))
      .select(col("event_id"), col("user_id"), col("observed"), col("filled"))
      .orderBy("event_id")
  }

  private val fillForwardOracle =
    """SELECT event_id, user_id, observed,
      |  last_value(observed IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_type = 'purchase' THEN value END AS observed
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  /** Linear interpolation between observations — the sensor-gap repair
    * [[fillForward]] approximates with a step function, done properly:
    * gaps are filled along the line between the bracketing observations,
    * weighted by event-time distance. Two windows per user (previous /
    * next observation value+time), both on the one user_id shuffle the
    * sessionization family already pays — no extra exchange.
    *
    * Determinism: timestamps enter the arithmetic as exact BIGINT
    * microseconds (< 2^53, so the DOUBLE casts are exact) and the
    * interpolation `prev + (next-prev) * (Δt/ΔT)` is written with the
    * identical operation order in the oracle — every IEEE op is exactly
    * rounded, so same ops + same order = same bits (SURVEY.md §7.4).
    */
  def interpolateLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val before = byTime.rowsBetween(Window.unboundedPreceding, -1)
    val after = byTime.rowsBetween(1, Window.unboundedFollowing)
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "purchase", col("value")).as("observed"),
        col("ts"), unix_micros(col("ts").cast("timestamp")).as("t"))
      .withColumn("prev_v", last(col("observed"), ignoreNulls = true).over(before))
      .withColumn("prev_t",
        last(when(col("observed").isNotNull, col("t")), ignoreNulls = true)
          .over(before))
      .withColumn("next_v", first(col("observed"), ignoreNulls = true).over(after))
      .withColumn("next_t",
        first(when(col("observed").isNotNull, col("t")), ignoreNulls = true)
          .over(after))
      .select(col("event_id"), col("user_id"), col("observed"),
        when(col("observed").isNotNull, col("observed"))
          .when(col("prev_v").isNotNull && col("next_v").isNotNull,
            col("prev_v") + (col("next_v") - col("prev_v"))
              * ((col("t") - col("prev_t")).cast(DoubleType)
                / (col("next_t") - col("prev_t")).cast(DoubleType)))
          .as("interp"))
      .orderBy("event_id")
  }

  private val interpolateLinearOracle =
    """SELECT event_id, user_id, observed,
      |  CASE WHEN observed IS NOT NULL THEN observed
      |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
      |         prev_v + (next_v - prev_v)
      |           * (CAST(t - prev_t AS DOUBLE)
      |              / CAST(next_t - prev_t AS DOUBLE))
      |  END AS interp
      |FROM (
      |  SELECT event_id, user_id, observed, t,
      |    last_value(observed IGNORE NULLS) OVER w_before AS prev_v,
      |    last_value(CASE WHEN observed IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER w_before AS prev_t,
      |    first_value(observed IGNORE NULLS) OVER w_after AS next_v,
      |    first_value(CASE WHEN observed IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER w_after AS next_t
      |  FROM (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
      |          CASE WHEN event_type = 'purchase' THEN value END AS observed
      |        FROM events)
      |  WINDOW w_before AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         w_after AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |ORDER BY event_id""".stripMargin

  /** Rolling exact median of purchase values per user — the robust
    * moving-average every metrics pipeline wants once outliers exist
    * (a mean-based rolling stat is one fat-finger away from garbage).
    * Exact `percentile(0.5)` over a 7-row frame; the streaming/approx
    * twin at unbounded history would be `approx_percentile`, but a
    * BOUNDED row frame keeps the exact form cheap: O(frame log frame)
    * per row on the one user_id exchange the window family already pays.
    *
    * Determinism: both engines interpolate the even-count case as
    * `lower + (upper - lower) * 0.5` over the same frame contents, so
    * the doubles match bitwise (no decimal routing needed — the values
    * pass through untouched except that one exactly-rounded interpolation).
    */
  def rollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val frame = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .withColumn("med7", percentile(col("value"), lit(0.5)).over(frame))
      .select(col("event_id"), col("user_id"), col("value"), col("med7"))
      .orderBy("event_id")
  }

  private val rollingMedianOracle =
    """SELECT event_id, user_id, value,
      |  median(value) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** Gaps-and-islands: runs of consecutive active DAYS per user (the
    * classic streak/retention primitive — "longest usage streak", "runs
    * of daily builds", "contiguous coverage windows"). The whole
    * computation is integer day numbers: island id = day − row_number(),
    * constant within a consecutive run and unique across runs.
    *
    * Shape: distinct (user, day) is a map-side-combined aggregate, the
    * row_number window rides the same user_id exchange, and the two
    * following aggregates are tiny. All-integer arithmetic ⇒ bit-exact
    * in any engine.
    */
  def gapsIslands(spark: SparkSession, sfDir: String): DataFrame = {
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = Tables(spark, sfDir, "events")
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
      .distinct()
    days
      .withColumn("island", col("day") - row_number().over(byDay))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_islands"),
        max(col("run_len")).as("longest_run"),
        sum(col("run_len")).as("active_days"))
      .orderBy("user_id")
  }

  private val gapsIslandsOracle =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      |  FROM events),
      |islands AS (
      |  SELECT user_id,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM days),
      |runs AS (
      |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
      |  FROM islands GROUP BY user_id, island)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(max(run_len) AS BIGINT) AS longest_run,
      |  CAST(sum(run_len) AS BIGINT) AS active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  /** OHLC bar downsampling: per (event_type, day) open/high/low/close/
    * volume bars — the standard time-series reduction (market bars, sensor
    * rollups, metrics downsampling before retention tiers).
    *
    * Open/close are SELECTIONS, not arithmetic: `min_by`/`max_by` ordered
    * by the unique (ts, event_id) pair copy one untouched double per bar,
    * so the result is bit-deterministic cross-engine with no decimal
    * routing (high/low/volume are max/min/count — likewise exact).
    *
    * Shape: one map-side-combined hash aggregate on (type, day) — each
    * partial carries one (ordering-key, value) pair of state per bar for
    * open and close, never a sorted window. At 100 TB this is THE way to
    * downsample: the alternative row_number()-over-bar spelling sorts
    * every partition; min_by keeps the scan pipelined and the exchange
    * carries only bar-level state. (The oracle uses the window spelling —
    * correct at oracle scale, and independent of the engine under test.)
    */
  def ohlcBars(spark: SparkSession, sfDir: String): DataFrame = {
    val ordKey = struct(col("ts"), col("event_id"))
    Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(
        min_by(col("value"), ordKey).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ordKey).as("close"),
        count(lit(1)).as("volume"))
      .select(col("event_type"), col("window.start").as("bar_ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .orderBy("event_type", "bar_ts")
  }

  private val ohlcBarsOracle =
    """WITH e AS (
      |  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS bar_ts, value,
      |    row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
      |                       ORDER BY ts, event_id) AS ra,
      |    row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
      |                       ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM events)
      |SELECT event_type, bar_ts,
      |  max(CASE WHEN ra = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rd = 1 THEN value END) AS close,
      |  CAST(count(*) AS BIGINT) AS volume
      |FROM e GROUP BY event_type, bar_ts
      |ORDER BY event_type, bar_ts""".stripMargin

  /** Week-over-week change — the period-comparison primitive of every
    * operational dashboard: weekly event counts per type, previous week
    * via `lag` over the aggregated (tiny) relation, delta exact and the
    * percent change ONE IEEE division of exact integers rounded once.
    * Monday truncation (`date_trunc('week')`) agrees cross-engine — the
    * same anchor the retention cohorts rely on. The window runs on the
    * AGGREGATED relation: weeks × types rows, so the sort is free at any
    * corpus scale.
    */
  def weekOverWeek(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("week"))
    Tables(spark, sfDir, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(byType))
      .select(col("week"), col("event_type"), col("n"),
        (col("n") - col("prev_n")).as("delta"),
        round((col("n") - col("prev_n")).cast(DoubleType) * 100
          / col("prev_n"), 6).as("pct_change"))
      .orderBy("event_type", "week")
  }

  private val weekOverWeekOracle =
    """SELECT week, event_type, n,
      |  n - prev_n AS delta,
      |  round(CAST(n - prev_n AS DOUBLE) * 100 / prev_n, 6) AS pct_change
      |FROM (
      |  SELECT date_trunc('week', ts) AS week, event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    lag(CAST(count(*) AS BIGINT), 1) OVER (
      |      PARTITION BY event_type ORDER BY date_trunc('week', ts)) AS prev_n
      |  FROM events GROUP BY 1, 2)
      |ORDER BY event_type, week""".stripMargin

  /** Gap filling (DENSIFICATION) — distinct from `win_fill_forward`,
    * which imputes nulls in rows that exist: here the missing rows don't
    * exist at all. The sensor/metrics pattern: 10-minute slots with no
    * events must still appear (n = 0) so downstream windows and charts
    * see a regular series, and the carried measure forward-fills from
    * the last observed slot per type. Spine = `sequence(min, max, 10m)`
    * exploded once from the GLOBAL bounds (one tiny aggregate) crossed
    * with the distinct types (broadcast — types are low-cardinality by
    * construction); the observed aggregate left-joins onto it. Slots
    * before a type's first observation keep NULL — fabricating a value
    * there would be lying. At 100 TB the spine is slots × types rows —
    * data-independent and tiny relative to the corpus — and the one
    * aggregate over the corpus is map-side combined; the forward-fill
    * window sorts the SPINE, never the events.
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val binned = ev
      .groupBy(window(col("ts"), "10 minutes").getField("start").as("slot"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = binned.agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 10 MINUTES"))).as("slot"))
    val types = ev.select("event_type").distinct()
    val fill = Window.partitionBy(col("event_type")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.crossJoin(broadcast(types))
      .join(binned, Seq("slot", "event_type"), "left_outer")
      .select(col("slot"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sum_value"), ignoreNulls = true).over(fill)
          .as("filled_sum"))
      .orderBy("slot", "event_type")
  }

  private val gapFillOracle =
    s"""WITH binned AS (
       |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS slot, event_type,
       |    CAST(count(*) AS BIGINT) AS n, ${sqlDsum("value")} AS sum_value
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT min(slot) AS lo, max(slot) AS hi FROM binned),
       |spine AS (
       |  SELECT unnest(generate_series(lo, hi, INTERVAL '10 minutes'))
       |    AS slot FROM bounds),
       |types AS (SELECT DISTINCT event_type FROM events)
       |SELECT s.slot, t.event_type, coalesce(b.n, 0) AS n,
       |  last_value(b.sum_value IGNORE NULLS) OVER (
       |    PARTITION BY t.event_type ORDER BY s.slot) AS filled_sum
       |FROM spine s CROSS JOIN types t
       |LEFT JOIN binned b ON b.slot = s.slot AND b.event_type = t.event_type
       |ORDER BY s.slot, t.event_type""".stripMargin

  /** Running DISTINCT count over an ordered window — "how many distinct
    * event kinds has this user produced so far" (feature engineering's
    * cumulative-cardinality column). Spark windows don't accept
    * `count(DISTINCT)`, and the naive `size(collect_set() OVER w)` carries
    * a per-row set — O(frame) state that collapses on hot keys at 100 TB.
    * The scalable spelling is two stacked windows of O(1) state: mark each
    * (user, event_type)'s FIRST occurrence with row_number = 1, then
    * running-sum the 0/1 marks over event time. The oracle is DuckDB's
    * native `count(DISTINCT) OVER` — a genuinely independent derivation of
    * the same column.
    */
  def runningDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("is_first",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .withColumn("kinds_seen", sum(col("is_first")).over(running))
      .select(col("user_id"), col("event_id"), col("ts"), col("kinds_seen"))
      .orderBy("user_id", "ts", "event_id")
  }

  private val runningDistinctOracle =
    """SELECT user_id, event_id, ts,
      |  CAST(count(DISTINCT event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS kinds_seen
      |FROM events
      |ORDER BY user_id, ts, event_id""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("win_time_tumbling",
      "tumbling 10-min event-time windows per event type",
      tumbling, Some(tumblingOracle)),
    Query("win_time_sliding",
      "sliding 10-min/5-min windows with distinct users",
      sliding, Some(slidingOracle)),
    Query("win_sessionize",
      "lag+cumsum sessionization, 30-min gap",
      sessionize, Some(sessionizeOracle)),
    Query("win_running_distinct",
      "running distinct-kind count: first-occurrence marks + running sum",
      runningDistinct, Some(runningDistinctOracle)),
    Query("win_session_window",
      "native session_window operator, 30-min gap",
      sessionWindowNative, Some(sessionWindowOracle)),
    Query("win_funnel_stages",
      "ordered view→click→purchase funnel via chained min-windows",
      funnelStages, Some(funnelStagesOracle)),
    Query("win_fill_forward",
      "forward-fill imputation: running last(ignoreNulls) per user",
      fillForward, Some(fillForwardOracle)),
    Query("win_interpolate_linear",
      "linear interpolation between bracketing observations per user",
      interpolateLinear, Some(interpolateLinearOracle)),
    Query("win_rolling_median",
      "exact 7-row rolling median of purchase values per user",
      rollingMedian, Some(rollingMedianOracle)),
    Query("win_gaps_islands",
      "gaps-and-islands: consecutive active-day runs per user",
      gapsIslands, Some(gapsIslandsOracle)),
    Query("ts_ohlc_bars",
      "OHLC daily bar downsampling via min_by/max_by selection aggregates",
      ohlcBars, Some(ohlcBarsOracle)),
    Query("win_session_dynamic_gap",
      "session_window with a per-event gap expression (running-max merge)",
      sessionWindowDynamicGap, Some(sessionWindowDynamicGapOracle)),
    Query("win_wow_change",
      "week-over-week deltas and percent change on the aggregated relation",
      weekOverWeek, Some(weekOverWeekOracle)),
    Query("ts_gap_fill",
      "densification: spine join fills absent slots, forward-fills measures",
      gapFill, Some(gapFillOracle)),
  )
}
