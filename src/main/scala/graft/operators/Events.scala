package graft.operators

import graft.{Dec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch equivalents of the streaming pipeline over `events` (the
  * streaming forms live in [[graft.streaming.StreamingOps]] and share
  * the same column logic — one definition, two execution modes).
  * Window starts are emitted as formatted strings so the DuckDB
  * oracle's type matches exactly.
  */
object Events {
  import Dec._

  /** Event-time tumbling 1-hour window aggregation per event type. */
  def eventWindows(spark: SparkSession, dir: String): DataFrame =
    eventWindows(Tables.load(spark, dir, "events"))

  def eventWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` payload and aggregate it — per-row JSON path evaluation
    * is a codegen'd projection (no UDF), so it scales as a scan. */
  def propsJson(spark: SparkSession, dir: String): DataFrame =
    propsJson(Tables.load(spark, dir, "events"))

  def propsJson(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Rolling window frame: 3-event moving average of `value` per user
    * in event-time order (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) —
    * the exact-decimal sum keeps the frame average engine-identical. */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame =
    rollingAvg(Tables.load(spark, dir, "events"))

  def rollingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    events
      .withColumn("rolling_avg",
        round(sum(dec(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w), 6))
      .select("user_id", "event_id", "value", "rolling_avg")
      .orderBy("user_id", "event_id")
  }

  /** Batch form of the stream-stream interval join
    * ([[graft.streaming.StreamingOps.attributeConversions]]): attribute
    * each purchase to the same user's clicks in the preceding window.
    * One shuffle on user_id with a range predicate inside the join —
    * exactly the state layout the streaming form keeps per key. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoin(Tables.load(spark, dir, "events"), 30)

  def intervalJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"interval $windowMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** Gap-based sessionization (30-min inactivity gap) via window
    * functions: flag session starts with lag(), number sessions with a
    * running sum, aggregate per session. Partitioned by user — at
    * scale one shuffle on user_id, each user's timeline processed
    * independently (the same state layout the streaming
    * flatMapGroupsWithState version keeps per key). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"))

  def sessionize(events: DataFrame): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        ((max(col("us")) - min(col("us"))).cast("double") / lit(1000000.0))
          .as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** AS-OF join: attach to each purchase the same user's most recent
    * click at or before it (last-touch attribution). Spark has no
    * native as-of operator; the scalable composition is the
    * union-marker form — interleave both sides on (ts, side) per user
    * and carry the last click forward with a running
    * `last(..., ignoreNulls)` window. ONE shuffle on user_id, linear
    * state per user timeline — never the quadratic
    * every-purchase×every-click range join (the naive form), and
    * exactly the per-key ordered-state layout a streaming as-of keeps.
    *
    * Determinism: clicks are pre-reduced per (user, ts) — max
    * event_id wins, its value via max_by — so an as-of tie can't pick
    * different rows between engines (DuckDB's ASOF JOIN leaves the
    * equal-timestamp choice unspecified). Click-at-purchase-ts counts
    * as "before" (side ordering: click 0 < purchase 1), matching
    * ASOF's `p.ts >= c.ts`. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoin(Tables.load(spark, dir, "events"))

  def asofJoin(events: DataFrame): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val u = c.select(col("user_id"), col("ts"), lit(0).as("side"),
        col("click_id"), col("click_value"),
        lit(null).cast("long").as("purchase_id"))
      .unionByName(p.select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("double").as("click_value"), col("purchase_id")))
    val w = Window.partitionBy("user_id").orderBy("ts", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("lastc", last(
        when(col("side") === 0,
          struct(col("ts").as("cts"), col("click_id").as("cid"),
            col("click_value").as("cval"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("purchase_id"),
        col("lastc.cid").as("click_id"),
        col("lastc.cval").as("click_value"),
        (unix_micros(col("ts")) - unix_micros(col("lastc.cts")))
          .cast("long").as("gap_us"))
      .orderBy("user_id", "purchase_id")
  }

  /** DuckDB oracle for [[asofJoin]] — the engine's native ASOF LEFT
    * JOIN over the identically tie-reduced click side. */
  def asofOracleSql: String = """
      WITH c AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          max(event_id) AS click_id,
          max_by(value, event_id) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, c.click_id, c.click_value,
        CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.purchase_id"""

  /** Cohort retention: cohort = a user's first active day; one output
    * row per (cohort day, day offset) with the distinct users still
    * active at that offset. The product-analytics staple over the
    * telemetry stream.
    *
    * Scale shape: events collapse to (user, day) FIRST (map-side
    * partial agg does most of the work before any shuffle), the cohort
    * lookup is a whole-partition window min over user_id on the
    * collapsed frame — never a self-join of the raw fact — and because
    * (user, day) rows are distinct, `n_users` is a plain count, not a
    * count-distinct shuffle. */
  def retention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.load(spark, dir, "events"))

  def retention(events: DataFrame): DataFrame = {
    val perDay = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"))
    perDay
      .withColumn("cohort_day", min(col("day")).over(Window.partitionBy("user_id")))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
      .orderBy("cohort_day", "day_offset")
  }

  def retentionOracleSql: String = """
      WITH per_day AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      coh AS (
        SELECT user_id, day, n_events,
          min(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM per_day)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
        count(*) AS n_users,
        CAST(sum(n_events) AS BIGINT) AS n_events
      FROM coh GROUP BY 1, 2
      ORDER BY cohort_day, day_offset"""

  /** Ordered funnel (signup → view → click → purchase) in ONE pass:
    * per user, chained running-min windows over (ts, event_id) — stage
    * k's candidate timestamps only count once stage k-1's running min
    * is set, so `s4` is the first purchase completing the full ordered
    * funnel. One shuffle+sort on user_id with four window passes over
    * the same ordering — never the 4-way self-join of per-step min
    * CTEs (which scans the fact four times and shuffles each). The
    * per-user output (stage count + signup→purchase latency) is the
    * strongest hashable gate; the 4-row summary is a trivial rollup of
    * it. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.load(spark, dir, "events"))

  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def stage(tpe: String, prev: Option[String]): Column = {
      val qualifies = prev.fold(col("event_type") === tpe)(p =>
        col("event_type") === tpe && col(p).isNotNull)
      min(when(qualifies, col("us"))).over(w)
    }
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("s1", stage("signup", None))
      .withColumn("s2", stage("view", Some("s1")))
      .withColumn("s3", stage("click", Some("s2")))
      .withColumn("s4", stage("purchase", Some("s3")))
      .groupBy("user_id")
      .agg(
        (max(col("s1").isNotNull.cast("long")) +
          max(col("s2").isNotNull.cast("long")) +
          max(col("s3").isNotNull.cast("long")) +
          max(col("s4").isNotNull.cast("long"))).as("n_stages"),
        (min(col("s4")) - min(col("s1"))).as("convert_us"))
      .orderBy("user_id")
  }

  /** Event-type transition matrix (the Markov/user-path view product
    * analytics draws as a Sankey): each user's next event in
    * (ts, event_id) order via ONE lead() window — a single shuffle on
    * user_id — then transition counts grouped on the (from, to) pair.
    * The pair frame is bounded by type-vocab² (25 rows here), so the
    * per-source probability is a window over a dimension-bounded
    * aggregate, never a second fact-scale pass. */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables.load(spark, dir, "events"))

  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  def transitionsOracleSql: String = """
      WITH e AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
        FROM events),
      pairs AS (
        SELECT event_type AS from_type, to_type, count(*) AS n
        FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
      FROM pairs ORDER BY from_type, to_type"""

  /** Daily-volume anomaly detection per event type: z-score of each
    * (type, day) count against that type's own daily distribution,
    * flagging |z| > 2 — the telemetry health check over the ingest
    * stream.
    *
    * Determinism + scale: the moments are EXACT integer sums carried
    * as DECIMAL(38,0) (order-independent at any parallelism, no
    * overflow at 100 TB daily volumes where c·n_days ~ 10¹⁴ and
    * Σc² ~ 10²³ blow past BIGINT); the z-score is one double
    * expression over those exact integers — z = (c·n − s) /
    * √(n·ss − s²), algebraically (c−μ)/σ without ever forming the
    * non-associative double mean. Everything after the (type, day)
    * collapse (map-side partial agg) is dimension-bounded; the
    * per-type moments broadcast back onto it. */
  def anomaly(spark: SparkSession, dir: String): DataFrame =
    anomaly(Tables.load(spark, dir, "events"))

  /** Per-type daily-volume moments (exact integer sums) — the OFFLINE
    * half consumed by the online scorer
    * [[graft.streaming.StreamingOps.anomalyStream]]. */
  def anomalyStats(events: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column): Column = c.cast(d38)
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(d(col("n_events"))).as("s"),
        sum(d(col("n_events")) * d(col("n_events"))).as("ss"))
  }

  def anomaly(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column): Column = c.cast(d38)
    // checkpointed: both the per-type moments and the flag join read
    // this frame — without materialization the fact scan runs twice
    // (ScanAudit caught the double read). The frame is (type × day)
    // bounded, so the checkpoint is tiny.
    val daily = graft.Ckpt(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events")))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(d(col("n_events"))).as("s"),
        sum(d(col("n_events")) * d(col("n_events"))).as("ss"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("num", (d(col("n_events")) * d(col("n_days")) - col("s")).cast("double"))
      .withColumn("den", sqrt((d(col("n_days")) * col("ss") - col("s") * col("s")).cast("double")))
      .filter(col("den") > 0.0 && abs(col("num")) > lit(zThreshold) * col("den"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"),
        graft.GraftFunctions.roundz(col("num") / col("den"), 6).as("z"))
      .orderBy("event_type", "day")
  }

  /** DuckDB oracle for [[anomaly]]: HUGEINT carries the same exact
    * integer moments DECIMAL(38,0) carries on the Spark side — both
    * are exact, so the doubles they cast to are identical. */
  def anomalyOracleSql(zThreshold: Double = 2.0): String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT event_type, count(*) AS n_days,
          sum(CAST(n_events AS HUGEINT)) AS s,
          sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) AS ss
        FROM daily GROUP BY 1),
      j AS (
        SELECT d.event_type, d.day, d.n_events,
          CAST(CAST(d.n_events AS HUGEINT) * CAST(t.n_days AS HUGEINT) - t.s AS DOUBLE) AS num,
          sqrt(CAST(CAST(t.n_days AS HUGEINT) * t.ss - t.s * t.s AS DOUBLE)) AS den
        FROM daily d JOIN stats t USING (event_type))
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
        (round(num / den, 6) + 0.0) AS z
      FROM j WHERE den > 0.0 AND abs(num) > $zThreshold * den
      ORDER BY event_type, day"""

  /** Calendar gap-fill — the resample step dashboards need before any
    * day-over-day math: per event type, daily counts with MISSING days
    * emitted as explicit zeros between that type's first and last
    * active day.
    *
    * Scale shape: the fact collapses to (type, day) with map-side
    * partial agg (one scan); the calendar skeleton explodes a
    * `sequence()` of days per type — rows bounded by type-vocab ×
    * span-days, a dimension — and the left join back to the collapsed
    * counts is dimension × dimension. Nothing after the first
    * aggregation touches fact-scale data. */
  def gapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.load(spark, dir, "events"))

  /** The filled (event_type, day, n_events) frame with `day` as DATE —
    * shared by [[gapFill]]'s presentation form and [[rollingRate]]. */
  private def filledDaily(events: DataFrame): DataFrame = {
    val daily = graft.Ckpt(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events")))
    val skeleton = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    skeleton.join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  def gapFill(events: DataFrame): DataFrame =
    filledDaily(events)
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n_events"))
      .orderBy("event_type", "day")

  def gapFillOracleSql: String = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      skel AS (
        SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds)
      SELECT s.event_type AS event_type, strftime(s.day, '%Y-%m-%d') AS day,
        coalesce(d.n_events, 0) AS n_events
      FROM skel s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
      ORDER BY s.event_type, day"""

  /** 7-day rolling event rate over the GAP-FILLED series (a RANGE
    * frame over raw data silently shrinks across missing days; filling
    * first makes the window truly 7 calendar days). The window
    * partitions by type and orders by day number — it runs on the
    * dimension-bounded filled frame, not the fact. */
  def rollingRate(spark: SparkSession, dir: String): DataFrame =
    rollingRate(Tables.load(spark, dir, "events"))

  def rollingRate(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("day_num")).rangeBetween(-6, Window.currentRow)
    filledDaily(events)
      .withColumn("day_num", datediff(col("day"), lit("2024-01-01")))
      .withColumn("n_7d", sum(col("n_events")).over(w))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("n_7d"))
      .orderBy("event_type", "day")
  }

  def rollingRateOracleSql: String = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      skel AS (
        SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds),
      filled AS (
        SELECT s.event_type, s.day, coalesce(d.n_events, 0) AS n_events,
          date_diff('day', DATE '2024-01-01', s.day) AS day_num
        FROM skel s LEFT JOIN daily d
          ON d.event_type = s.event_type AND d.day = s.day)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
        CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day_num
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
      FROM filled
      ORDER BY event_type, day"""

  /** DAU / trailing-7-day WAU — the activity metrics every telemetry
    * dashboard leads with, computed EXACTLY (no HLL sketch, so the
    * result is oracle-checkable and engine-stable).
    *
    * Scale shape: the fact collapses to DISTINCT (user, day) presence
    * first — the only fact-scale pass. DAU is then a plain count (rows
    * already distinct — no count-distinct shuffle). WAU uses the
    * contribution-window trick: each presence row contributes to days
    * d..d+6, so a 7-way explode + distinct + count replaces a per-day
    * 7-day self-join; shuffle volume is 7× the collapsed presence
    * frame (users × active days), never the raw fact. */
  def dauWau(spark: SparkSession, dir: String): DataFrame =
    dauWau(Tables.load(spark, dir, "events"))

  def dauWau(events: DataFrame): DataFrame = {
    val presence = graft.Ckpt(events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
    val dau = presence.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = presence
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), 6), expr("interval 1 day"))).as("day2"))
      .distinct()
      .groupBy("day2").agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day") === wau("day2"))
      .select(date_format(dau("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
      .orderBy("day")
  }

  /** e18: sketch-based DAU / trailing-7-day WAU — the
    * approximate twin of [[dauWau]] (r11 verdict #4). e13 is exact
    * and oracle-checkable, but its first stage is a DISTINCT
    * (user, day) collapse whose shuffle grows with RAW user×day
    * cardinality — at 100 TB that one exchange dominates the query.
    * This form never shuffles raw cardinality at all: one fact-scale
    * pass folds each day's users into a DataSketches HLL sketch
    * (map-side partial sketches merge, so the exchange carries ONE
    * sketch per (partition, day) — KB per day, independent of user
    * count), and every later stage operates on the day-cardinality
    * sketch frame. WAU needs no 7× contribution explode of presence
    * rows either: a day's sketch is REUSED for the 7 windows it
    * feeds (sketch-row explode, ≤ 7×days rows), and `hll_union_agg`
    * max-merges the window — exactly how production dashboards
    * compute rolling uniques.
    *
    * Correctness contract: rows-only at the driver (no DuckDB HLL
    * replica exists), with the error bound spec-gated against the
    * exact e13 — DataSketches HLL relative standard error at the
    * default lgConfigK=12 is ~1.6%, and estimates are DETERMINISTIC
    * for a given input SET (register state is an order-free max), so
    * the determinism sweep still applies. */
  def dauApprox(spark: SparkSession, dir: String): DataFrame =
    dauApprox(Tables.load(spark, dir, "events"))

  def dauApprox(events: DataFrame): DataFrame = {
    // one row per day, whatever the user cardinality
    val daily = graft.Ckpt(events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk")))
    val dau = daily.select(col("day"),
      hll_sketch_estimate(col("sk")).as("dau_approx"))
    val wau = daily
      .select(explode(sequence(col("day"), date_add(col("day"), 6),
        expr("interval 1 day"))).as("day2"), col("sk"))
      .groupBy("day2")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_approx"))
    dau.join(wau, dau("day") === wau("day2"))
      .select(date_format(dau("day"), "yyyy-MM-dd").as("day"),
        col("dau_approx"), col("wau_approx"))
      .orderBy("day")
  }

  /** e19: histogram quantiles — approximate per-type percentiles of
    * `value` from a FIXED-BIN histogram, the deterministic sketch
    * sibling of q20's exact percentiles. At 100 TB the exact form
    * needs a per-group sort (percentile_approx's GK summaries avoid
    * that but their merge is fold-order-sensitive — byte-unstable
    * across partitionings, which this repo's determinism sweep
    * rejects); the histogram form is two fact-scale aggregate passes
    * with [[QhBins]]-bounded state per group (bounds, then bin
    * counts — both order-free), and the estimate error is bounded by
    * ONE BIN WIDTH (spec-gated against the exact percentiles).
    *
    * Estimates are the UPPER EDGE of the first bin whose cumulative
    * count reaches ⌈q·n⌉ (rank threshold in exact integers,
    * (n·q+99) div 100 — no float rank). All per-row arithmetic is
    * the same single expression in both engines; the cumulative walk
    * runs over the (groups × bins)-bounded histogram, never the
    * fact. A constant-valued group (hi = lo) degenerates to one bin
    * and every estimate lands on hi exactly. */
  val QhBins = 256

  def quantileHist(spark: SparkSession, dir: String): DataFrame =
    quantileHist(Tables.load(spark, dir, "events"))

  def quantileHist(events: DataFrame): DataFrame = {
    val base = events.select(col("event_type"), col("value"))
    val bounds = graft.Ckpt(base.groupBy("event_type").agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"),
      count(lit(1)).as("n")))
    val wexp = (col("hi") - col("lo")) / lit(QhBins.toDouble)
    val binned = base
      .join(broadcast(bounds), "event_type")
      .select(col("event_type"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("lo")) / wexp).cast("long"),
            lit(QhBins - 1L))).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("k"))
    val cum = binned.withColumn("cum",
      sum(col("k")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    // ⌈n·q/100⌉ in TRUE integral division (Column./ on longs is
    // double division — an off-by-one against the floor semantics)
    def thr(q: Int) = expr(s"(n * $q + 99) div 100")
    def pick(q: Int) = min(when(col("cum") >= thr(q), col("bin")))
    def edge(b: org.apache.spark.sql.Column) =
      when(col("hi") === col("lo"), col("hi"))
        .otherwise(col("lo") + (b + 1).cast("double") * wexp)
    cum.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), col("lo"), col("hi"), col("n"))
      .agg(pick(50).as("b50"), pick(95).as("b95"), pick(99).as("b99"))
      .select(col("event_type"), col("n").as("n_events"),
        col("lo"), col("hi"),
        graft.GraftFunctions.roundz(edge(col("b50")), 6).as("p50"),
        graft.GraftFunctions.roundz(edge(col("b95")), 6).as("p95"),
        graft.GraftFunctions.roundz(edge(col("b99")), 6).as("p99"))
      .orderBy("event_type")
  }

  /** e20: LOG-width histogram quantiles — e19's heavy-tail variant.
    * Fixed-width bins bound error by one ABSOLUTE bin width, which is
    * useless on a long-tailed field: p99 of a lognormal lands in a
    * huge top bin and the estimate overshoots by orders of magnitude.
    * Log-spaced bins over [lo, hi] bound the error MULTIPLICATIVELY
    * instead — the selected upper edge is at most one log-bin factor
    * (hi/lo)^(1/[[QhBins]]) above the exact order statistic (≈ 5.5%
    * at hi/lo = 10⁶, B = 256) at every quantile, head or tail. Same
    * two order-free fact-scale passes, same exact integer rank
    * thresholds, same (groups × bins)-bounded cumulative walk.
    *
    * Positive domain REQUIRED (log bins are undefined at ≤ 0):
    * validated with one aggregate that also catches NULLs, refusing
    * loudly (g12's discipline) rather than binning garbage.
    *
    * Determinism note: the bin ratio (ln(v) − ln(lo))/w and the
    * estimate exp(ln(lo) + (b+1)·w) pass through `round(·, 6)`
    * BEFORE floor/output — t14/t17's discipline for transcendental
    * kernels, absorbing the ≤1-ulp divergence between Java's and
    * DuckDB's libm so the two engines agree on the bin index and the
    * byte-level estimate. */
  def logQuantileHist(spark: SparkSession, dir: String): DataFrame =
    // the registered entry scopes to the POSITIVE subset: log bins are
    // undefined at ≤ 0 and real event streams carry zero-value rows
    // (sf0.1 does) — excluding them upfront is the domain rule, the
    // oracle applies the same predicate, and the strict refusal below
    // still protects direct callers who pass unfiltered frames
    logQuantileHist(Tables.load(spark, dir, "events")
      .filter(col("value") > 0.0))

  def logQuantileHist(events: DataFrame): DataFrame = {
    val base = events.select(col("event_type"), col("value"))
    val chk = base.agg(count(when(col("value").isNull, 1)).as("nulls"),
      min(col("value")).as("mn")).head()
    require(chk.getLong(0) == 0,
      s"e20 needs non-null values, saw ${chk.getLong(0)} null rows")
    // min of zero rows is null — check before getDouble so empty
    // input refuses loudly instead of NPEing inside the null read
    require(!chk.isNullAt(1), "e20 needs a non-empty input frame")
    require(chk.getDouble(1) > 0.0,
      s"e20 needs a positive domain, saw min ${chk.getDouble(1)}")
    val bounds = graft.Ckpt(base.groupBy("event_type").agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"),
      count(lit(1)).as("n")))
    val wexp = (log(col("hi")) - log(col("lo"))) / lit(QhBins.toDouble)
    val binned = base
      .join(broadcast(bounds), "event_type")
      .select(col("event_type"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor(round((log(col("value")) - log(col("lo"))) / wexp, 6))
              .cast("long"),
            lit(QhBins - 1L))).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("k"))
    val cum = binned.withColumn("cum",
      sum(col("k")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    def thr(q: Int) = expr(s"(n * $q + 99) div 100")
    def pick(q: Int) = min(when(col("cum") >= thr(q), col("bin")))
    def edge(b: org.apache.spark.sql.Column) =
      when(col("hi") === col("lo"), col("hi"))
        .otherwise(round(exp(log(col("lo")) + (b + 1).cast("double") * wexp), 6))
    cum.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), col("lo"), col("hi"), col("n"))
      .agg(pick(50).as("b50"), pick(95).as("b95"), pick(99).as("b99"))
      .select(col("event_type"), col("n").as("n_events"),
        col("lo"), col("hi"),
        edge(col("b50")).as("p50"),
        edge(col("b95")).as("p95"),
        edge(col("b99")).as("p99"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[logQuantileHist]] — identical log binning
    * (with the same round(6) ulp absorption), identical integer rank
    * thresholds, identical rounded upper-edge arithmetic. */
  def e20OracleSql: String = s"""
      WITH ev AS (
        SELECT event_type, value FROM events WHERE value > 0),
      bounds AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi,
          count(*) AS n
        FROM ev GROUP BY event_type),
      binned AS (
        SELECT e.event_type,
          CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
            ELSE least(CAST(floor(round((ln(e.value) - ln(b.lo))
              / ((ln(b.hi) - ln(b.lo)) / $QhBins.0), 6)) AS BIGINT),
              ${QhBins - 1}) END AS bin,
          count(*) AS k
        FROM ev e JOIN bounds b USING (event_type)
        GROUP BY 1, 2),
      cum AS (
        SELECT event_type, bin,
          sum(k) OVER (PARTITION BY event_type ORDER BY bin
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned),
      picked AS (
        SELECT c.event_type,
          min(CASE WHEN c.cum >= (b.n * 50 + 99) // 100 THEN c.bin END) AS b50,
          min(CASE WHEN c.cum >= (b.n * 95 + 99) // 100 THEN c.bin END) AS b95,
          min(CASE WHEN c.cum >= (b.n * 99 + 99) // 100 THEN c.bin END) AS b99
        FROM cum c JOIN bounds b USING (event_type)
        GROUP BY c.event_type)
      SELECT b.event_type, b.n AS n_events, b.lo, b.hi,
        CASE WHEN b.hi = b.lo THEN b.hi
          ELSE round(exp(ln(b.lo) + CAST(p.b50 + 1 AS DOUBLE)
            * ((ln(b.hi) - ln(b.lo)) / $QhBins.0)), 6) END AS p50,
        CASE WHEN b.hi = b.lo THEN b.hi
          ELSE round(exp(ln(b.lo) + CAST(p.b95 + 1 AS DOUBLE)
            * ((ln(b.hi) - ln(b.lo)) / $QhBins.0)), 6) END AS p95,
        CASE WHEN b.hi = b.lo THEN b.hi
          ELSE round(exp(ln(b.lo) + CAST(p.b99 + 1 AS DOUBLE)
            * ((ln(b.hi) - ln(b.lo)) / $QhBins.0)), 6) END AS p99
      FROM bounds b JOIN picked p USING (event_type)
      ORDER BY b.event_type"""

  /** DuckDB oracle for [[quantileHist]] — identical binning
    * expression, identical integer rank thresholds, identical
    * upper-edge arithmetic. */
  def e19OracleSql: String = s"""
      WITH bounds AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi,
          count(*) AS n
        FROM events GROUP BY event_type),
      binned AS (
        SELECT e.event_type,
          CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
            ELSE least(CAST(floor((e.value - b.lo)
              / ((b.hi - b.lo) / $QhBins.0)) AS BIGINT),
              ${QhBins - 1}) END AS bin,
          count(*) AS k
        FROM events e JOIN bounds b USING (event_type)
        GROUP BY 1, 2),
      cum AS (
        SELECT event_type, bin,
          sum(k) OVER (PARTITION BY event_type ORDER BY bin
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned),
      picked AS (
        SELECT c.event_type,
          min(CASE WHEN c.cum >= (b.n * 50 + 99) // 100 THEN c.bin END) AS b50,
          min(CASE WHEN c.cum >= (b.n * 95 + 99) // 100 THEN c.bin END) AS b95,
          min(CASE WHEN c.cum >= (b.n * 99 + 99) // 100 THEN c.bin END) AS b99
        FROM cum c JOIN bounds b USING (event_type)
        GROUP BY c.event_type)
      SELECT b.event_type, b.n AS n_events, b.lo, b.hi,
        (round(CASE WHEN b.hi = b.lo THEN b.hi
          ELSE b.lo + CAST(p.b50 + 1 AS DOUBLE)
            * ((b.hi - b.lo) / $QhBins.0) END, 6) + 0.0) AS p50,
        (round(CASE WHEN b.hi = b.lo THEN b.hi
          ELSE b.lo + CAST(p.b95 + 1 AS DOUBLE)
            * ((b.hi - b.lo) / $QhBins.0) END, 6) + 0.0) AS p95,
        (round(CASE WHEN b.hi = b.lo THEN b.hi
          ELSE b.lo + CAST(p.b99 + 1 AS DOUBLE)
            * ((b.hi - b.lo) / $QhBins.0) END, 6) + 0.0) AS p99
      FROM bounds b JOIN picked p USING (event_type)
      ORDER BY b.event_type"""

  /** e17: daily heavy hitters — the top-k event types per day (the
    * "what dominated traffic each day" dashboard readout, and the
    * generic per-window heavy-hitter shape). Counts are one exact
    * (day, type) aggregate; the per-day top-k ranks through the
    * native TopKPerGroup plan (map-side per-day heaps, shuffle
    * bounded by k·days rows), never a per-day total sort — the s8
    * discipline pointed at the events table. Ties break on the type
    * string in both engines. */
  def dailyTopk(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    dailyTopk(Tables.load(spark, dir, "events"), k)

  def dailyTopk(events: DataFrame, k: Int): DataFrame = {
    val counts = events
      .select(to_date(col("ts")).as("day0"), col("event_type"))
      .groupBy("day0", "event_type")
      .agg(count(lit(1)).as("n_events"))
    graft.plans.TopK.perGroup(counts, Seq("day0"),
        Seq(("n_events", false), ("event_type", true)), k)
      .select(date_format(col("day0"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("rnk"))
      .orderBy("day", "rnk")
  }

  /** DuckDB oracle for [[dailyTopk]] — same counts, a ranked window
    * with the same (count desc, type asc) tie-break. */
  def e17OracleSql(k: Int = 3): String = s"""
      WITH c AS (
        SELECT CAST(ts AS DATE) AS day0, event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT day0, event_type, n_events,
          CAST(row_number() OVER (PARTITION BY day0
            ORDER BY n_events DESC, event_type) AS INT) AS rnk
        FROM c)
      SELECT strftime(day0, '%Y-%m-%d') AS day, event_type, n_events, rnk
      FROM r WHERE rnk <= $k ORDER BY day, rnk"""

  def dauWauOracleSql: String = """
      WITH presence AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, count(*) AS dau FROM presence GROUP BY day),
      contrib AS (
        SELECT DISTINCT user_id, day2 FROM (
          SELECT user_id,
            unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS day2
          FROM presence) t),
      wau AS (SELECT day2, count(*) AS wau FROM contrib GROUP BY day2)
      SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
      FROM dau d JOIN wau w ON w.day2 = d.day
      ORDER BY day"""

  /** DuckDB oracle for [[funnel]] — the same chained running-min
    * windows, layered as subqueries (a window alias can't be referenced
    * inside another window in the same SELECT). */
  def funnelOracleSql: String = """
      WITH e AS (
        SELECT user_id, event_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS s1 FROM e),
      w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND s1 IS NOT NULL THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS s2 FROM w1),
      w3 AS (SELECT *, min(CASE WHEN event_type = 'click' AND s2 IS NOT NULL THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS s3 FROM w2),
      w4 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND s3 IS NOT NULL THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS s4 FROM w3)
      SELECT user_id,
        CAST(max(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END)
           + max(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END)
           + max(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END)
           + max(CASE WHEN s4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_stages,
        min(s4) - min(s1) AS convert_us
      FROM w4 GROUP BY user_id
      ORDER BY user_id"""

  /** Inter-event-gap distribution (e11) — the cadence profile behind
    * session-gap and watermark tuning: for each event type, the
    * distribution of the time since the SAME user's previous event
    * (any type). One user_id window (per-user timelines bounded),
    * then a type-keyed aggregate over exact µs integer gaps; the
    * percentile interpolation runs on those exact ints, so both
    * engines interpolate identical doubles (q20's discipline), and
    * seconds conversion happens once at the end. */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame =
    interEventGaps(graft.Tables.load(spark, dir, "events"))

  def interEventGaps(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap_us, 0.5)") / 1000000.0, 4).as("median_gap_s"),
        round(expr("percentile(gap_us, 0.9)") / 1000000.0, 4).as("p90_gap_s"),
        (max(col("gap_us")).cast("double") / 1000000.0).as("max_gap_s"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[interEventGaps]]. */
  def e11OracleSql: String = """
      WITH ev AS (
        SELECT user_id, event_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          CAST(ts AS TIMESTAMP) AS tss
        FROM events),
      gaps AS (
        SELECT event_type,
          us - lag(us) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS gap_us
        FROM ev)
      SELECT event_type, count(*) AS n_gaps,
        round(quantile_cont(gap_us, 0.5) / 1000000.0, 4) AS median_gap_s,
        round(quantile_cont(gap_us, 0.9) / 1000000.0, 4) AS p90_gap_s,
        CAST(max(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""

  /** e14: top-k behavioural paths — the most frequent event-type
    * trigrams WITHIN a session (e2's 30-minute-gap sessions). The
    * sequence-mining query product teams run to find dominant flows
    * and funnel candidates. Scale shape: session labelling and the
    * two leads share ONE user_id shuffle (the trigram window is a
    * refinement of the session window's partitioning); the trigram
    * aggregate is bounded by |event_types|³, and the final top-k
    * sorts only that tiny frame. Counts are integers — exact. */
  def pathTopk(spark: SparkSession, dir: String): DataFrame =
    pathTopk(Tables.load(spark, dir, "events"), 20)

  def pathTopk(events: DataFrame, k: Int): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bySess = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("e2", lead(col("event_type"), 1).over(bySess))
      .withColumn("e3", lead(col("event_type"), 2).over(bySess))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** DuckDB oracle for [[pathTopk]]. */
  def e14OracleSql(k: Int = 20): String = s"""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          CAST(ts AS TIMESTAMP) AS tss
        FROM events),
      lagged AS (
        SELECT *, us - lag(us) OVER (PARTITION BY user_id
          ORDER BY tss, event_id) AS gap
        FROM ev),
      sess AS (
        SELECT *, sum(CASE WHEN gap IS NULL OR gap > 1800000000
            THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY tss, event_id) AS session_id
        FROM lagged),
      tri AS (
        SELECT event_type AS e1,
          lead(event_type, 1) OVER w AS e2,
          lead(event_type, 2) OVER w AS e3
        FROM sess
        WINDOW w AS (PARTITION BY user_id, session_id ORDER BY tss, event_id))
      SELECT e1, e2, e3, count(*) AS n
      FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY e1, e2, e3
      ORDER BY n DESC, e1, e2, e3 LIMIT $k"""

  /** e16: RFM segmentation — users bucketed into quartiles of
    * Recency (days since last event, against the corpus anchor),
    * Frequency (event count), and Monetary (DECIMAL value sum), the
    * classic customer-base triage matrix. Deliberately NOT ntile():
    * a global ntile would total-sort the user set in one window
    * partition (q40's documented caveat) — instead the three quartile
    * EDGES come from one exact-percentile aggregate and are broadcast
    * back over a projection (q42's median pattern), so the user frame
    * is never globally sorted. Edges are ROUNDED to 4 dp before the
    * comparisons (e11's cross-engine percentile discipline); the
    * compared values are integers or 2-dp decimals, so a rounded edge
    * can only tie exactly, where `>` is stable in both engines. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegments(Tables.load(spark, dir, "events"))

  def rfmSegments(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id").agg(
      max(col("ts")).as("last_ts"),
      count(lit(1)).as("freq"),
      Dec.dsum(col("value")).as("mon"))
    val anchor = users.agg(max(col("last_ts")).as("anchor"))
    val u2 = users.crossJoin(broadcast(anchor))
      .withColumn("rec",
        datediff(to_date(col("anchor")), to_date(col("last_ts"))).cast("long"))
    val edges = broadcast(u2.agg(
      expr("percentile(rec, array(0.25, 0.5, 0.75))").as("re"),
      expr("percentile(freq, array(0.25, 0.5, 0.75))").as("fe"),
      expr("percentile(mon, array(0.25, 0.5, 0.75))").as("me")))
    def seg(v: String, e: String): Column =
      (lit(1) +
        (col(v).cast("double") > round(element_at(col(e), 1), 4)).cast("int") +
        (col(v).cast("double") > round(element_at(col(e), 2), 4)).cast("int") +
        (col(v).cast("double") > round(element_at(col(e), 3), 4)).cast("int"))
        .cast("long")
    u2.crossJoin(edges)
      .select(seg("rec", "re").as("r_seg"), seg("freq", "fe").as("f_seg"),
        seg("mon", "me").as("m_seg"), col("mon"))
      .groupBy("r_seg", "f_seg", "m_seg")
      .agg(count(lit(1)).as("n_users"), Dec.dsum(col("mon")).as("total_value"))
      .orderBy("r_seg", "f_seg", "m_seg")
  }

  /** DuckDB oracle for [[rfmSegments]]. */
  def e16OracleSql: String = """
      WITH users AS (
        SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts,
          count(*) AS freq,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS mon
        FROM events GROUP BY user_id),
      anchor AS (SELECT max(last_ts) AS a FROM users),
      u2 AS (
        SELECT user_id, freq, mon,
          date_diff('day', CAST(last_ts AS DATE), CAST(a AS DATE)) AS rec
        FROM users, anchor),
      edges AS (
        SELECT
          round(quantile_cont(rec, 0.25), 4) AS r1,
          round(quantile_cont(rec, 0.5), 4) AS r2,
          round(quantile_cont(rec, 0.75), 4) AS r3,
          round(quantile_cont(freq, 0.25), 4) AS f1,
          round(quantile_cont(freq, 0.5), 4) AS f2,
          round(quantile_cont(freq, 0.75), 4) AS f3,
          round(quantile_cont(mon, 0.25), 4) AS m1,
          round(quantile_cont(mon, 0.5), 4) AS m2,
          round(quantile_cont(mon, 0.75), 4) AS m3
        FROM u2),
      segs AS (
        SELECT
          CAST(1 + CAST(CAST(rec AS DOUBLE) > r1 AS INT)
            + CAST(CAST(rec AS DOUBLE) > r2 AS INT)
            + CAST(CAST(rec AS DOUBLE) > r3 AS INT) AS BIGINT) AS r_seg,
          CAST(1 + CAST(CAST(freq AS DOUBLE) > f1 AS INT)
            + CAST(CAST(freq AS DOUBLE) > f2 AS INT)
            + CAST(CAST(freq AS DOUBLE) > f3 AS INT) AS BIGINT) AS f_seg,
          CAST(1 + CAST(mon > m1 AS INT) + CAST(mon > m2 AS INT)
            + CAST(mon > m3 AS INT) AS BIGINT) AS m_seg,
          mon
        FROM u2, edges)
      SELECT r_seg, f_seg, m_seg, count(*) AS n_users,
        CAST(sum(CAST(mon AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM segs GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** e15: cohort value matrix — users cohorted by first-seen WEEK
    * (both engines truncate weeks to Monday; the corpus spans ~a
    * month, so month cohorts would collapse to one cell), value
    * accumulated per (cohort, weeks-since) cell. The retention-revenue
    * triangle every growth team reads. Age is integer day arithmetic
    * on week-aligned dates (exactly divisible by 7 — no fractional
    * cross-engine semantics); value sums go through DECIMAL
    * (order-independent, oracle-exact). Scale shape: one user_id
    * shuffle to pin each user's cohort (first event), then the cell
    * aggregate over (cohort, age) — dimension-bounded output, no
    * fact-side join. */
  def cohortValue(spark: SparkSession, dir: String): DataFrame =
    cohortValue(Tables.load(spark, dir, "events"))

  def cohortValue(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("first_ts", first(col("ts")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cw", date_trunc("week", col("first_ts")).cast("date"))
      .withColumn("ew", date_trunc("week", col("ts")).cast("date"))
      .withColumn("cohort_week", date_format(col("cw"), "yyyy-MM-dd"))
      .withColumn("age_weeks",
        (datediff(col("ew"), col("cw")) / 7).cast("long"))
      .groupBy("cohort_week", "age_weeks")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Dec.dsum(col("value")).as("total_value"))
      .orderBy("cohort_week", "age_weeks")
  }

  /** DuckDB oracle for [[cohortValue]]. */
  def e15OracleSql: String = """
      WITH ev AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS tss
        FROM events),
      cohorted AS (
        SELECT *, first_value(tss) OVER (PARTITION BY user_id
          ORDER BY tss, event_id) AS first_ts
        FROM ev)
      SELECT strftime(CAST(date_trunc('week', first_ts) AS DATE),
          '%Y-%m-%d') AS cohort_week,
        CAST(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
          CAST(date_trunc('week', tss) AS DATE)) // 7 AS BIGINT) AS age_weeks,
        count(*) AS n_events,
        count(DISTINCT user_id) AS n_users,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM cohorted
      GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Arrival-order block width for e21's distributed prefix-max. */
  final val WaBlock = 65536L

  /** e21: WATERMARK AUDIT — the event-time disorder profile that
    * answers "how much watermark slack does this stream need?"
    * BEFORE a `withWatermark` is deployed: per event type, each
    * event's lateness = (running max event-time over arrival order,
    * inclusive) − own event-time; report late-event count/rate, and
    * the max/p95/p99 lateness a watermark must cover. Arrival order
    * is `event_id` (the stream's append sequence). A stream with zero
    * disorder (this corpus) reports all-zero lateness — the honest
    * "no slack needed" answer; the spec plants disorder to pin
    * detection.
    *
    * Scale shape — the running max is a sequential scan recurrence,
    * and the naive window (one partition per event type) puts an
    * entire 100 TB stream's type into ONE task. The standard
    * distributed prefix-scan decomposition instead: (1) a local
    * running max within [[WaBlock]]-sized arrival blocks (bounded
    * partitions), (2) a per-block max rolled up to a block-count-
    * scale frame where the exclusive prefix max is a tiny window,
    * (3) one (event_type, blk)-keyed stitch join back — unhinted,
    * because the block-summary frame grows with the corpus
    * (n_events/65536 rows per type) and a forced broadcast of it is
    * exactly the driver-side failure the decomposition avoids; AQE
    * broadcasts it on its own while small. Lateness is exact integer µs; the
    * percentile interpolation runs on those ints (e11's discipline).
    * Identical to the single-window oracle by associativity of max. */
  def watermarkAudit(spark: SparkSession, dir: String): DataFrame =
    watermarkAudit(Tables.load(spark, dir, "events"))

  def watermarkAudit(events: DataFrame): DataFrame = {
    // integer div, not `/`: Column./ is DOUBLE division and would
    // smear block boundaries past 2^53 event ids
    val ev = events.select(col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      expr(s"event_id div $WaBlock").as("blk"))
    // (1) block-local running max (inclusive) — bounded partitions
    val localW = Window.partitionBy("event_type", "blk")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ev.withColumn("lmax", max(col("us")).over(localW))
    // (2) exclusive prefix max over block summaries — block-count scale
    val blocks = ev.groupBy("event_type", "blk").agg(max(col("us")).as("bmax"))
    val prevW = Window.partitionBy("event_type").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = blocks.withColumn("pmax", max(col("bmax")).over(prevW))
      .select(col("event_type"), col("blk"), col("pmax"))
    // (3) stitch: running max = max(block-local, all earlier blocks).
    // NO broadcast hint: `prev` has one row per (type, 64Ki-id block),
    // i.e. rows = n_events/65536 per type — corpus-PROPORTIONAL, which
    // at the 100 TB design point (~10¹¹ events) is 10⁶–10⁷ rows and
    // would die as a driver-collected broadcast. The (event_type, blk)
    // equi-join hash-joins fine, and AQE still broadcasts on its own
    // whenever the summary frame is actually small (the sf0.1 case).
    val late = local.join(prev, Seq("event_type", "blk"))
      .select(col("event_type"),
        (greatest(col("lmax"), coalesce(col("pmax"), col("lmax")))
          - col("us")).as("late_us"))
    late.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("late_us") > 0, 1)).as("n_late"),
        round(count(when(col("late_us") > 0, 1)).cast("double")
          / count(lit(1)).cast("double"), 6).as("late_rate"),
        round(max(col("late_us")).cast("double") / 1000000.0, 4)
          .as("max_late_s"),
        round(expr("percentile(late_us, 0.95)") / 1000000.0, 4)
          .as("p95_late_s"),
        round(expr("percentile(late_us, 0.99)") / 1000000.0, 4)
          .as("p99_late_s"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[watermarkAudit]] — ONE inclusive running-max
    * window per type (the blocked decomposition is equal by
    * associativity of max), identical integer lateness, identical
    * percentile interpolation. */
  def e21OracleSql: String = """
      WITH e AS (
        SELECT event_type, event_id,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      w AS (
        SELECT event_type,
          max(us) OVER (PARTITION BY event_type ORDER BY event_id
            ROWS UNBOUNDED PRECEDING) - us AS late_us
        FROM e)
      SELECT event_type, count(*) AS n_events,
        count(CASE WHEN late_us > 0 THEN 1 END) AS n_late,
        round(CAST(count(CASE WHEN late_us > 0 THEN 1 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS late_rate,
        round(CAST(max(late_us) AS DOUBLE) / 1000000.0, 4) AS max_late_s,
        round(quantile_cont(late_us, 0.95) / 1000000.0, 4) AS p95_late_s,
        round(quantile_cont(late_us, 0.99) / 1000000.0, 4) AS p99_late_s
      FROM w GROUP BY event_type ORDER BY event_type"""

  /** e22's sliding burst window, microseconds (60 s inclusive). */
  final val BurstWindowUs = 60000000L

  /** e22: BURST profile — per-user peak request rate, the
    * abuse/rate-limit telemetry read before provisioning a limiter:
    * for every event, the count of the SAME user's events in the
    * trailing [[BurstWindowUs]] event-time window (a RANGE frame over
    * exact integer µs — peers at the same timestamp count together
    * regardless of row order, so the measure is
    * partitioning-independent); per user the MAXIMUM such count is
    * their burst; output is the burst histogram (burst size → user
    * count) a limiter threshold is read off.
    *
    * Scale shape: one user-keyed shuffle; the RANGE window sorts
    * within user timelines (bounded per user); two bounded rollups
    * after. All integers — exact. */
  def burstProfile(spark: SparkSession, dir: String): DataFrame =
    burstProfile(Tables.load(spark, dir, "events"))

  def burstProfile(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-(BurstWindowUs - 1), 0)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("in_win", count(lit(1)).over(w))
      .groupBy("user_id").agg(max(col("in_win")).as("burst"))
      .groupBy("burst").agg(count(lit(1)).as("n_users"))
      .orderBy("burst")
  }

  /** DuckDB oracle for [[burstProfile]] — the identical µs RANGE
    * frame and rollups. */
  def e22OracleSql: String = s"""
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      w AS (
        SELECT user_id, count(*) OVER (
          PARTITION BY user_id ORDER BY us
          RANGE BETWEEN ${BurstWindowUs - 1} PRECEDING AND CURRENT ROW)
          AS in_win
        FROM e),
      b AS (SELECT user_id, max(in_win) AS burst FROM w GROUP BY 1)
      SELECT burst, count(*) AS n_users
      FROM b GROUP BY burst ORDER BY burst"""

  /** Count–Min sketch geometry of [[cmsHeavyHitters]]: depth × width
    * counters is the ENTIRE reduce-side state. The row-hash constants
    * are fixed odd multipliers (xxhash's published primes) under the
    * Mersenne prime 2³¹−1; (p−1)·max(A) < 2⁶³ so the multiply never
    * wraps — unlike x11's audited quantize, there is no key-range
    * precondition at all. */
  final val CmsDepth = 4
  final val CmsWidth = 256L
  final val CmsTopK = 10
  final val CmsPrime = 2147483647L
  val CmsA: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val CmsB: Seq[Long] = Seq(1L, 7L, 13L, 19L)

  /** e23: COUNT–MIN heavy-hitter accuracy audit (Cormode &
    * Muthukrishnan 2005) — the MERGEABLE-sketch counterpart of e17's
    * exact daily top-k: build the [[CmsDepth]]×[[CmsWidth]] sketch
    * over the per-user event stream, then report, for the exact
    * top-[[CmsTopK]] users, the sketch's estimate (min over the
    * user's depth counters) beside the exact count and the overshoot.
    * CMS never underestimates, so `overshoot ≥ 0` is a structural
    * invariant (spec-gated); the audit is what sizes width/depth
    * before the sketch replaces the exact count in a streaming or
    * multi-tenant rollup.
    *
    * Everything is integer arithmetic on fixed public constants —
    * fully deterministic, so unlike e18's HLL this sketch is
    * oracle-gated bit-for-bit, not rows-only.
    *
    * Scale shape: the sketch build is ONE explode([[CmsDepth]]) +
    * count with map-side combine whose reduce state is the
    * depth×width counter table — CONSTANT size regardless of corpus
    * (the mergeability that makes CMS the 100 TB shape: executor
    * partials are themselves sketches). The exact top-k is a
    * TakeOrdered heap over the per-user aggregate; the estimate join
    * broadcasts the constant-size counter table. */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    cmsHeavyHitters(Tables.load(spark, dir, "events"))

  /** The CMS row-hash: bucket of key `u` under depth row `r` —
    * shared by the batch audit and the streaming sketch twin. */
  def cmsBucket(u: Column, r: Column): Column = {
    val aArr = array(CmsA.map(lit): _*)
    val bArr = array(CmsB.map(lit): _*)
    pmod(pmod(pmod(u, lit(CmsPrime)) * element_at(aArr, r + 1)
      + element_at(bArr, r + 1), lit(CmsPrime)), lit(CmsWidth))
  }

  def cmsHeavyHitters(events: DataFrame): DataFrame = {
    def bucket(u: Column, r: Column) = cmsBucket(u, r)
    val keyed = events.select(col("user_id").as("u"))
    val counters = keyed
      .select(col("u"), explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("r"))
      .groupBy(col("r"), bucket(col("u"), col("r")).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val top = keyed.groupBy("u").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("u")).limit(CmsTopK)
    top
      .select(col("u"), col("exact_cnt"),
        explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("r"))
      .withColumn("bucket", bucket(col("u"), col("r")))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("u")
      .agg(first(col("exact_cnt")).as("exact_cnt"),
        min(col("c")).as("cms_est"))
      .select(col("u").as("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overshoot"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  /** Baseline window of [[cusumDrift]] (days). */
  final val CusumBaselineDays = 7

  /** e24: CUSUM drift detection (Page 1954) over the per-type daily
    * volume — the SEQUENTIAL complement of e10's pointwise z-score: a
    * slow 1σ drift never trips a z-threshold on any single day, but
    * its deviations ACCUMULATE. Upper CUSUM with the standard
    * parameters: baseline = the first [[CusumBaselineDays]] days
    * (μ, σ from exact integer sums), allowance k = σ/2, decision
    * interval h = 4σ; S_t = max(0, S_{t−1} + x_t − μ − k) reported
    * per type as alarm count, first alarm day, and the peak statistic.
    *
    * The recurrence is NOT computed sequentially: S_t = P_t −
    * min(0, min_{τ≤t} P_τ) with P the prefix sum of quantized
    * deviations — two stacked bounded windows (prefix sum, prefix
    * min), the associative reformulation that would also block-scan
    * at e21 scale if days were ever corpus-scale (they are not: the
    * day axis is calendar-bounded).
    *
    * Determinism: deviations are round-9 quantized into
    * DECIMAL(38,9) BEFORE the prefix sums (exact thereafter); μ and
    * σ are single double expressions over exact integer baseline
    * sums; the alarm compares round-9 grids on both sides.
    *
    * Scale shape: ONE fact-scale (type, day) count shuffle (map-side
    * combine); everything after lives on the calendar-bounded daily
    * frame — the rank/prefix windows partition per type over ≤ a few
    * thousand rows regardless of corpus size. Per-type stats
    * broadcast back as a dimension frame. */
  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
    cusumDrift(Tables.load(spark, dir, "events"))

  /** The (event_type, day, cnt, r) observed-day rank frame e24 and the
    * baseline publisher share — checkpointed, one fact-scale pass. */
  private def cusumRanked(events: DataFrame): DataFrame = {
    val daily = graft.Ckpt(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))
    val wr = Window.partitionBy("event_type").orderBy("day")
    graft.Ckpt(daily.withColumn("r", row_number().over(wr).cast("long")))
  }

  /** Per-type baseline moments from the first [[CusumBaselineDays]]
    * observed days of the rank frame. */
  private def cusumStatsFrom(ranked: DataFrame): DataFrame = {
    val B = CusumBaselineDays
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column): Column = c.cast(d38)
    ranked.filter(col("r") <= B)
      .groupBy("event_type")
      .agg(count(lit(1)).as("bn"), sum(d(col("cnt"))).as("sx"),
        sum(d(col("cnt")) * d(col("cnt"))).as("sxx"))
      // a type without a full baseline has no calibrated reference —
      // dropped identically in both engines
      .filter(col("bn") === B)
      .select(col("event_type"),
        (col("sx").cast("double") / lit(B.toDouble)).as("mu"),
        (sqrt((lit(B) * col("sxx") - col("sx") * col("sx")).cast("double"))
          / lit(B.toDouble)).as("sigma"))
  }

  /** BATCH-published CUSUM baseline — the offline half of the
    * calibrate-offline / monitor-online split
    * ([[graft.streaming.StreamingOps.cusumStream]] is the online
    * half): per event type, (mu, sigma) over the first
    * [[CusumBaselineDays]] observed days, derived EXACTLY as
    * [[cusumDrift]]'s internal baseline so the stream twin's deviation
    * grid is bit-identical to the batch monitor's. */
  def cusumBaseline(events: DataFrame): DataFrame =
    cusumStatsFrom(cusumRanked(events))

  def cusumDrift(events: DataFrame): DataFrame = {
    val B = CusumBaselineDays
    val ranked = cusumRanked(events)
    val stats = cusumStatsFrom(ranked)
    val wcum = Window.partitionBy("event_type").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mon = ranked.filter(col("r") > B)
      .join(broadcast(stats), "event_type")
      .withColumn("devq", round(col("cnt").cast("double") - col("mu")
        - lit(0.5) * col("sigma"), 9).cast("decimal(38,9)"))
      .withColumn("p", sum(col("devq")).over(wcum))
      .withColumn("s", col("p") -
        least(min(col("p")).over(wcum), lit(0).cast("decimal(38,9)")))
      .withColumn("alarm", round(col("s").cast("double"), 9) >
        round(lit(4.0) * col("sigma"), 9))
    mon.groupBy("event_type")
      .agg(count(lit(1)).as("n_monitored"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        date_format(min(when(col("alarm"), col("day"))), "yyyy-MM-dd")
          .as("first_alarm_day"),
        round(max(col("s")).cast("double"), 6).as("max_cusum"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[cusumDrift]] — identical baseline moments,
    * deviation quantization, and stacked prefix windows. */
  def e24OracleSql: String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      ranked AS (
        SELECT event_type, day, cnt, row_number() OVER (
          PARTITION BY event_type ORDER BY day) AS r
        FROM daily),
      stats AS (
        SELECT event_type,
          CAST(sx AS DOUBLE) / $CusumBaselineDays.0 AS mu,
          sqrt(CAST($CusumBaselineDays * sxx - sx * sx AS DOUBLE))
            / $CusumBaselineDays.0 AS sigma
        FROM (
          SELECT event_type, count(*) AS bn,
            sum(CAST(cnt AS DECIMAL(38,0))) AS sx,
            sum(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)))
              AS sxx
          FROM ranked WHERE r <= $CusumBaselineDays GROUP BY 1)
        WHERE bn = $CusumBaselineDays),
      mon AS (
        SELECT ranked.event_type, day, r, sigma,
          CAST(round(CAST(cnt AS DOUBLE) - mu - 0.5 * sigma, 9)
            AS DECIMAL(38,9)) AS devq
        FROM ranked JOIN stats USING (event_type)
        WHERE r > $CusumBaselineDays),
      cum1 AS (
        SELECT event_type, day, r, sigma, sum(devq) OVER (
          PARTITION BY event_type ORDER BY r ROWS UNBOUNDED PRECEDING) AS p
        FROM mon),
      cum2 AS (
        SELECT event_type, day, sigma, p, min(p) OVER (
          PARTITION BY event_type ORDER BY r ROWS UNBOUNDED PRECEDING) AS pm
        FROM cum1),
      flag AS (
        SELECT event_type, day, sigma,
          p - least(pm, CAST(0 AS DECIMAL(38,9))) AS s
        FROM cum2)
      SELECT event_type, count(*) AS n_monitored,
        CAST(sum(CASE WHEN round(CAST(s AS DOUBLE), 9)
          > round(4.0 * sigma, 9) THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        strftime(min(CASE WHEN round(CAST(s AS DOUBLE), 9)
          > round(4.0 * sigma, 9) THEN day END), '%Y-%m-%d')
          AS first_alarm_day,
        round(CAST(max(s) AS DOUBLE), 6) AS max_cusum
      FROM flag GROUP BY event_type ORDER BY event_type"""

  /** DuckDB oracle for [[cmsHeavyHitters]] — identical hash lattice,
    * counter table, and min-estimate. */
  def e23OracleSql: String = s"""
      WITH params AS (
        SELECT * FROM (VALUES ${CmsA.zip(CmsB).zipWithIndex.map {
          case ((a, b), r) => s"($r, $a, $b)" }.mkString(", ")})
          t(r, a, b)),
      ex AS (SELECT user_id AS u, count(*) AS exact_cnt
             FROM events GROUP BY 1),
      top AS (SELECT u, exact_cnt FROM ex
              ORDER BY exact_cnt DESC, u LIMIT $CmsTopK),
      sk AS (
        SELECT r, ((e.user_id % $CmsPrime) * a + b) % $CmsPrime
          % $CmsWidth AS bucket, count(*) AS c
        FROM events e, params GROUP BY 1, 2),
      est AS (
        SELECT t.u, any_value(t.exact_cnt) AS exact_cnt,
          min(c) AS cms_est
        FROM top t JOIN params p ON true
        JOIN sk ON sk.r = p.r AND sk.bucket =
          ((t.u % $CmsPrime) * p.a + p.b) % $CmsPrime % $CmsWidth
        GROUP BY t.u)
      SELECT u AS user_id, exact_cnt, cms_est,
        cms_est - exact_cnt AS overshoot
      FROM est ORDER BY exact_cnt DESC, user_id"""

  /** Seasonal lag for [[seasonalNaive]] — weekly seasonality, the
    * dominant cycle in event traffic. */
  final val SeasonalLag = 7

  /** e25: SEASONAL-NAIVE FORECAST AUDIT — the seasonality-aware
    * complement of e10's pointwise z-score and e24's cumulative
    * drift: both treat every day as exchangeable, so a perfectly
    * healthy weekly rhythm (quiet weekends) reads as repeated
    * anomalies. The seasonal-naive forecast ŷ(d) = y(d − 7 days) is
    * the standard forecasting BASELINE (Hyndman & Athanasopoulos,
    * forecast accuracy chapters): per event type, score it with
    * MAPE = mean |y − ŷ|/ŷ, signed bias = mean (y − ŷ)/ŷ, and the
    * worst day — the numbers that tell a pipeline operator whether
    * day-over-week volume is stable enough for naive capacity
    * planning, and which day broke the rhythm.
    *
    * The lag is CALENDAR days (an interval join on day − 7), not row
    * offsets, so observation gaps produce no forecast rather than a
    * misaligned one (q39's gap-fill is the upstream repair if a
    * dense calendar is wanted); zero-count forecast days are
    * impossible (absent days simply have no row).
    *
    * Determinism: daily counts are integers; each day's ratio is ONE
    * double expression round-12 quantized into DECIMAL, summed
    * order-free, divided once; the worst day is a (round-12 ape,
    * earliest day) struct max.
    *
    * Scale shape: one fact-scale aggregate to (type, day); the
    * self-join is per-type calendar-bounded; everything after is
    * type-bounded. */
  def seasonalNaive(spark: SparkSession, dir: String): DataFrame =
    seasonalNaive(Tables.load(spark, dir, "events"))

  def seasonalNaive(events: DataFrame): DataFrame = {
    val L = SeasonalLag
    val daily = graft.Ckpt(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))
    val joined = daily.as("cur")
      .join(daily.select(col("event_type"),
          col("day").as("pday"), col("cnt").as("fcst")).as("prev"),
        col("cur.event_type") === col("prev.event_type")
          && col("cur.day") === date_add(col("pday"), L))
      .select(col("cur.event_type").as("event_type"), col("cur.day").as("day"),
        col("cnt"), col("fcst"))
      .withColumn("ape", round(abs(col("cnt") - col("fcst")).cast("double")
        / col("fcst").cast("double"), 12).cast("decimal(25,12)"))
      .withColumn("sbias", round((col("cnt") - col("fcst")).cast("double")
        / col("fcst").cast("double"), 12).cast("decimal(25,12)"))
    joined.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("ape")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mape"),
        graft.GraftFunctions.roundz(
          (sum(col("sbias")).cast("double")
            / count(lit(1)).cast("double")), 6).as("bias"),
        max(struct(col("ape"), to_unix_timestamp(col("day")).as("nday"),
          date_format(col("day"), "yyyy-MM-dd").as("d"))).as("w"))
      .select(col("event_type"), col("n_days"), col("mape"), col("bias"),
        col("w.d").as("worst_day"),
        round(col("w.ape").cast("double"), 6).as("max_ape"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[seasonalNaive]] — identical calendar lag
    * join, round-12 ratio grid, order-free decimal folds, and
    * (ape, day) struct-max worst-day pick. */
  def e25OracleSql: String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      j AS (
        SELECT cur.event_type, cur.day, cur.cnt, prev.cnt AS fcst,
          CAST(round(CAST(abs(cur.cnt - prev.cnt) AS DOUBLE)
            / CAST(prev.cnt AS DOUBLE), 12) AS DECIMAL(25,12)) AS ape,
          CAST(round(CAST(cur.cnt - prev.cnt AS DOUBLE)
            / CAST(prev.cnt AS DOUBLE), 12) AS DECIMAL(25,12)) AS sbias
        FROM daily cur JOIN daily prev
          ON cur.event_type = prev.event_type
          AND cur.day = prev.day + INTERVAL $SeasonalLag DAY),
      w AS (
        SELECT event_type, day, ape,
          row_number() OVER (PARTITION BY event_type
            ORDER BY ape DESC, day DESC) AS rn
        FROM j)
      SELECT j.event_type, count(*) AS n_days,
        round(CAST(sum(j.ape) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          AS mape,
        (round(CAST(sum(j.sbias) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          + 0.0) AS bias,
        strftime(any_value(w.day), '%Y-%m-%d') AS worst_day,
        round(CAST(any_value(w.ape) AS DOUBLE), 6) AS max_ape
      FROM j JOIN w ON j.event_type = w.event_type AND w.rn = 1
      GROUP BY j.event_type ORDER BY j.event_type"""

  /** e33: MASE FORECAST SCORING (Hyndman & Koehler 2006) — the
    * scale-free companion to e25's MAPE: MAPE is undefined at zero
    * counts and explodes near them, while MASE divides the seasonal-
    * naive forecast's MAE by the in-sample lag-1 naive MAE — the
    * standard "is the model beating the dumbest baseline" dial
    * (MASE < 1 = yes), comparable ACROSS types of any volume.
    *
    * Determinism: counts are integers, so both absolute-error sums
    * are EXACT integer aggregates (order-free); the only doubles are
    * the two final divisions (round-6) and the ratio (roundz-6 —
    * MASE itself is s7/s1 since the day sets coincide). A flat
    * series (naive MAE 0) NULLs in both engines. Evaluable days =
    * observed days whose lag-7 AND lag-1 days are both observed
    * (e25's no-zero-fill convention).
    *
    * Scale shape: one fact-scale count aggregate, two (types × days)-
    * bounded calendar self-joins, one group-by. */
  def e33Mase(spark: SparkSession, dir: String): DataFrame =
    mase(Tables.load(spark, dir, "events"))

  def mase(events: DataFrame): DataFrame = {
    val daily = graft.Ckpt(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))
    def lagged(k: Int, nm: String) = daily.select(col("event_type"),
      date_add(col("day"), k).as("day"), col("cnt").as(nm))
    daily
      .join(lagged(SeasonalLag, "f7"), Seq("event_type", "day"))
      .join(lagged(1, "f1"), Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cnt") - col("f7"))).as("s7"),
        sum(abs(col("cnt") - col("f1"))).as("s1"))
      .select(col("event_type"), col("n_days"),
        round(col("s7").cast("double") / col("n_days").cast("double"), 6)
          .as("mae_seasonal"),
        round(col("s1").cast("double") / col("n_days").cast("double"), 6)
          .as("mae_naive"),
        when(col("s1") > 0, graft.GraftFunctions.roundz(
          col("s7").cast("double") / col("s1").cast("double"), 6))
          .as("mase"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[mase]] — identical calendar lag joins,
    * exact integer error sums, the same two divisions. */
  def e33OracleSql: String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT cur.event_type, count(*) AS n_days,
        round(CAST(sum(abs(cur.cnt - p7.cnt)) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS mae_seasonal,
        round(CAST(sum(abs(cur.cnt - p1.cnt)) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS mae_naive,
        CASE WHEN sum(abs(cur.cnt - p1.cnt)) > 0 THEN
          (round(CAST(sum(abs(cur.cnt - p7.cnt)) AS DOUBLE)
            / CAST(sum(abs(cur.cnt - p1.cnt)) AS DOUBLE), 6) + 0.0) END
          AS mase
      FROM daily cur
      JOIN daily p7 ON cur.event_type = p7.event_type
        AND cur.day = p7.day + INTERVAL $SeasonalLag DAY
      JOIN daily p1 ON cur.event_type = p1.event_type
        AND cur.day = p1.day + INTERVAL 1 DAY
      GROUP BY cur.event_type ORDER BY cur.event_type"""

  /** Attribution lookback in days — touches older than this before a
    * conversion get no credit (the marketing-analytics convention). */
  final val AttributionLookbackDays = 3

  /** e26: FIRST/LAST-TOUCH ATTRIBUTION — for every conversion
    * (purchase), the earliest and latest marketing touch (click or
    * view) by the same user within the [[AttributionLookbackDays]]
    * lookback, plus the touch count: the two classic single-touch
    * attribution models plus the input to any multi-touch weighting,
    * in ONE pass. The product-analytics sibling of [[asofJoin]] (which
    * is last-touch only, unbounded lookback).
    *
    * Shape: touches are first reduced to one row per (user, µs)
    * (max_by event_id — [[asofJoin]]'s tie law), then touches and
    * purchases ride ONE union frame ordered by the UNIQUE key
    * k = 2·µs + side; a RANGE window [-(2·lookback_µs + 1), 0]
    * implements "touch.ts ∈ [purchase.ts − lookback, purchase.ts]"
    * exactly (the +1 half-step makes the ≥ bound inclusive across the
    * side bit). first/last(ignoreNulls) over touch-only CASE columns
    * are deterministic because touch keys are unique per user;
    * purchases sharing a µs see identical frames. NEVER a self-join
    * of the fact table.
    *
    * Scale: one shuffle+sort on user_id; window state is
    * lookback-bounded. 100 TB: the frame holds only the lookback's
    * touches per user — constant for bounded human activity; a bot
    * user's giant frame degrades that one partition only (the skew
    * note d2 carries). */
  def attribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.load(spark, dir, "events"))

  def attribution(events: DataFrame): DataFrame = {
    val lookbackUs = AttributionLookbackDays.toLong * 86400L * 1000000L
    val touches = events
      .filter(col("event_type") === "click" || col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("tid"),
        max_by(col("event_type"), col("event_id")).as("ttype"))
      .select(col("user_id"), (unix_micros(col("ts")) * 2).as("k"),
        lit(0).as("side"), col("tid"), col("ttype"),
        lit(null).cast("long").as("purchase_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), (unix_micros(col("ts")) * 2 + 1).as("k"),
        lit(1).as("side"), lit(null).cast("long").as("tid"),
        lit(null).cast("string").as("ttype"),
        col("event_id").as("purchase_id"))
    val w = Window.partitionBy("user_id").orderBy("k")
      .rangeBetween(-(2L * lookbackUs + 1L), 0L)
    val tCase = when(col("side") === 0, col("tid"))
    val tyCase = when(col("side") === 0, col("ttype"))
    touches.unionByName(purchases)
      .withColumn("first_tid", first(tCase, ignoreNulls = true).over(w))
      .withColumn("first_type", first(tyCase, ignoreNulls = true).over(w))
      .withColumn("last_tid", last(tCase, ignoreNulls = true).over(w))
      .withColumn("last_type", last(tyCase, ignoreNulls = true).over(w))
      .withColumn("n_touches",
        sum(when(col("side") === 0, 1L).otherwise(0L)).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("purchase_id"), col("first_tid"),
        col("first_type"), col("last_tid"), col("last_type"),
        col("n_touches"))
      .orderBy("user_id", "purchase_id")
  }

  /** DuckDB oracle for [[attribution]] — the identical union frame,
    * unique key, and range window. */
  def e26OracleSql: String = {
    val lb = 2L * AttributionLookbackDays.toLong * 86400000000L + 1L
    s"""
      WITH touches AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) * 2 AS k,
          0 AS side, max(event_id) AS tid,
          max_by(event_type, event_id) AS ttype,
          CAST(NULL AS BIGINT) AS purchase_id
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY 1, 2),
      purchases AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) * 2 + 1 AS k,
          1 AS side, CAST(NULL AS BIGINT) AS tid,
          CAST(NULL AS VARCHAR) AS ttype, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'),
      u AS (SELECT * FROM touches UNION ALL SELECT * FROM purchases),
      att AS (
        SELECT user_id, side, purchase_id,
          first_value(CASE WHEN side = 0 THEN tid END IGNORE NULLS)
            OVER w AS first_tid,
          first_value(CASE WHEN side = 0 THEN ttype END IGNORE NULLS)
            OVER w AS first_type,
          last_value(CASE WHEN side = 0 THEN tid END IGNORE NULLS)
            OVER w AS last_tid,
          last_value(CASE WHEN side = 0 THEN ttype END IGNORE NULLS)
            OVER w AS last_type,
          sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) OVER w AS n_touches
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY k
          RANGE BETWEEN $lb PRECEDING AND CURRENT ROW))
      SELECT user_id, purchase_id, first_tid, first_type, last_tid,
        last_type, CAST(coalesce(n_touches, 0) AS BIGINT) AS n_touches
      FROM att WHERE side = 1
      ORDER BY user_id, purchase_id"""
  }

  /** EWMA truncation window (days) and per-day decay for [[ewma]]. */
  final val EwmaWindowDays = 14
  final val EwmaDecay = "0.7" // exact decimal literal, NOT a double

  /** e27: EWMA LEVEL + DEVIATION ALARM — the exponentially-weighted
    * daily-rate monitor between e10's fixed-window z-score and e24's
    * cumulative CUSUM: level_d = Σ_j w_j·x_{d−j} / Σ_j w_j over the
    * last [[EwmaWindowDays]] calendar days with w_j = decay^j (the
    * normalizing denominator makes the leading edge unbiased, and the
    * α factor of the classic recurrence cancels). A day alarms when
    * |cnt − level_{d−1}| > 3·√level_{d−1} (Poisson-scale deviation
    * from yesterday's level).
    *
    * Determinism: the calendar is zero-filled per type (gap days are
    * real zero-rate days, not absent rows — q39's repair is upstream
    * for sparse feeds), so lag-j IS day-j; the weights ride as the
    * EXACT integers w_j·10^13 = 7^j·10^(13−j) (0.7^j terminates at 13
    * decimal digits — no libm pow, whose rounding differs across
    * engines; the 10^13 scale cancels in num/den), so the whole
    * ladder is exact integer arithmetic; ONE double division per day,
    * round-6; the alarm rides √ (IEEE correctly-rounded,
    * engine-identical) of the round-6 grid.
    *
    * Scale: one fact-scale count aggregate; the calendar frame is
    * (types × days)-bounded; the lag ladder is one window sort per
    * type. */
  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewma(Tables.load(spark, dir, "events"))

  def ewma(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val cal = span.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("day")
    // weights scaled to EXACT integers w_j·10^13 = 7^j·10^(13−j): the
    // 10^13 factor cancels in num/den, and the whole ladder stays in
    // DECIMAL(38,0) integer arithmetic — a fractional-decimal add
    // chain would blow precision 38 and silently erode the scale
    // (Spark's allowPrecisionLoss), which is exactly the drift this
    // operator must not have
    val weights = (0 until EwmaWindowDays).map(j =>
      new java.math.BigDecimal(EwmaDecay).pow(j)
        .movePointRight(13).toBigIntegerExact)
    val num = weights.zipWithIndex.map { case (wj, j) =>
      coalesce(lag(col("cnt"), j).over(w).cast("decimal(24,0)")
        * lit(new java.math.BigDecimal(wj)),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))
    }.reduce(_ + _)
    val den = weights.zipWithIndex.map { case (wj, j) =>
      when(lag(col("cnt"), j).over(w).isNotNull,
        lit(new java.math.BigDecimal(wj)))
        .otherwise(lit(java.math.BigDecimal.ZERO)).cast("decimal(38,0)")
    }.reduce(_ + _)
    val leveled = filled
      .withColumn("level",
        round(num.cast("double") / den.cast("double"), 6))
      .withColumn("prev_level", lag(col("level"), 1).over(w))
    leveled
      .withColumn("dev", graft.GraftFunctions.roundz(
        col("cnt").cast("double") - col("prev_level"), 6))
      // coalesce: the first day has no baseline — "no alarm", not
      // NULL (a nullable boolean round-trips as None vs NaN across
      // the two engines' parquet/pandas paths)
      .withColumn("alarm", coalesce(
        abs(col("dev")) > lit(3.0) * sqrt(col("prev_level")), lit(false)))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("level"), col("dev"), col("alarm"))
      .orderBy("event_type", "day")
  }

  /** DuckDB oracle for [[ewma]] — identical zero-filled calendar,
    * exact-decimal weight ladder, and round-6 level grid. */
  def e27OracleSql: String = {
    val weights = (0 until EwmaWindowDays).map(j =>
      new java.math.BigDecimal(EwmaDecay).pow(j)
        .movePointRight(13).toBigIntegerExact.toString)
    val num = weights.zipWithIndex.map { case (wj, j) =>
      s"coalesce(CAST(lag(cnt, $j) OVER w AS HUGEINT) * $wj, 0)"
    }.mkString(" + ")
    val den = weights.zipWithIndex.map { case (wj, j) =>
      s"CAST(CASE WHEN lag(cnt, $j) OVER w IS NOT NULL THEN $wj" +
        s" ELSE 0 END AS HUGEINT)"
    }.mkString(" + ")
    s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      lv AS (
        SELECT event_type, day, cnt,
          round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS level
        FROM filled
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      pv AS (
        SELECT event_type, day, cnt, level,
          lag(level, 1) OVER (PARTITION BY event_type ORDER BY day)
            AS prev_level
        FROM lv)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        CAST(cnt AS BIGINT) AS cnt, level,
        (round(CAST(cnt AS DOUBLE) - prev_level, 6) + 0.0) AS dev,
        coalesce(abs(round(CAST(cnt AS DOUBLE) - prev_level, 6) + 0.0)
          > 3.0 * sqrt(prev_level), FALSE) AS alarm
      FROM pv ORDER BY event_type, day"""
  }

  /** Power-iteration steps for [[markovMix]] — FIXED BY CONTRACT
    * (g1's class): the stationary vector is float-valued and only
    * approached asymptotically, so the query semantics are "π after
    * exactly MarkovIters steps from uniform". */
  final val MarkovIters = 40

  /** e29: MARKOV LONG-RUN STATE MIX — the stationary distribution of
    * e9's transition matrix: where does a user's session settle if
    * the observed dynamics keep running? e9 reports the one-step
    * structure; funnels (e8) read hand-picked paths; this is the
    * whole-chain summary (the PageRank of the event-type graph) that
    * ranks states by long-run occupancy. π = lim πPᵗ approximated by
    * exactly [[MarkovIters]] power steps from the uniform vector.
    *
    * Determinism: transition counts are exact integers; P entries are
    * single double divisions; the matrix is ONE row of (i, j, p)
    * structs sorted by (i, j) — k²-bounded, k = event-type count —
    * and every step's π_j is an index-order fold of pi[i]·p products
    * (identical IEEE sequence both engines; the oracle replays the
    * identical expression tree in a recursive CTE, e28's pattern). A
    * type with NO outgoing transitions gets the standard absorbing
    * self-loop completion (P[i][i] = 1), identically in both engines.
    *
    * Scale shape: one fact-scale user-ordered window (e9's shape) to
    * the pair counts; EVERYTHING after is k²-bounded. */
  def markovMix(spark: SparkSession, dir: String): DataFrame =
    markovMix(Tables.load(spark, dir, "events"))

  def markovMix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    markovMixFromPairs(events
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")))
  }

  /** [[markovMix]]'s core over a (from_type, to_type, n) transition-
    * count frame — split out for planted specs. */
  def markovMixFromPairs(pairs: DataFrame): DataFrame = {
    val types = graft.Ckpt(pairs.select(col("from_type").as("t"))
      .union(pairs.select(col("to_type"))).distinct())
    val idx = types.withColumn("i",
      (row_number().over(Window.orderBy("t")) - 1).cast("int"))
    val rows = pairs
      .join(idx.select(col("t").as("from_type"), col("i")), "from_type")
      .join(idx.select(col("t").as("to_type"), col("i").as("j")),
        "to_type")
    val rowSum = rows.groupBy("i").agg(sum(col("n")).as("rs"))
    val ent = rows.join(rowSum, "i")
      .select(col("i"), col("j"),
        (col("n").cast("double") / col("rs").cast("double")).as("p"))
    val missing = idx.join(rowSum.select(col("i")), Seq("i"), "left_anti")
      .select(col("i"), col("i").as("j"), lit(1.0).as("p"))
    val packed = ent.unionByName(missing)
      .select(struct(col("i"), col("j"), col("p")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("m"))
    val kf = idx.agg(count(lit(1)).cast("int").as("k"))
    val fold = s"""aggregate(
      sequence(1, $MarkovIters),
      transform(sequence(1, k),
        x -> CAST(1.0 AS DOUBLE) / CAST(k AS DOUBLE)),
      (pi, it) -> transform(sequence(0, k - 1), j ->
        aggregate(filter(m, e -> e.j = j), CAST(0.0 AS DOUBLE),
          (acc, e) -> acc + element_at(pi, e.i + 1) * e.p)),
      pi -> pi)"""
    packed.crossJoin(broadcast(kf)) // one-row type count (e29)
      .select(posexplode(expr(fold)).as(Seq("i0", "stat")))
      .select(col("i0").cast("int").as("i"), col("stat"))
      .join(idx, "i")
      .join(rowSum.select(col("i"), col("rs")), Seq("i"), "left_outer")
      .select(col("t").as("event_type"),
        coalesce(col("rs"), lit(0L)).as("n_out"),
        graft.GraftFunctions.roundz(col("stat"), 6).as("stationary"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[markovMix]] — identical pair counts, sorted
    * (i, j, p) matrix row, and the same index-order power steps in a
    * recursive CTE (NOT a list_reduce struct accumulator — q60's
    * documented DuckDB 1.0 bug). */
  def e29OracleSql: String = s"""
      WITH RECURSIVE e AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
            AS to_type
        FROM events),
      pairs AS (
        SELECT event_type AS from_type, to_type, count(*) AS n
        FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
      types AS (
        SELECT DISTINCT t FROM (
          SELECT from_type AS t FROM pairs
          UNION SELECT to_type FROM pairs)),
      idx AS MATERIALIZED (
        SELECT t, CAST(row_number() OVER (ORDER BY t) - 1 AS INT) AS i
        FROM types),
      rws AS (
        SELECT fi.i AS i, ti.i AS j, n
        FROM pairs
        JOIN idx fi ON fi.t = from_type
        JOIN idx ti ON ti.t = to_type),
      rowsum AS (SELECT i, sum(n) AS rs FROM rws GROUP BY 1),
      ent AS (
        SELECT i, j, CAST(n AS DOUBLE) / CAST(rs AS DOUBLE) AS p
        FROM rws JOIN rowsum USING (i)
        UNION ALL
        SELECT idx.i, idx.i, CAST(1.0 AS DOUBLE)
        FROM idx LEFT JOIN rowsum ON rowsum.i = idx.i
        WHERE rowsum.i IS NULL),
      packed AS MATERIALIZED (
        SELECT list(struct_pack(i := i, j := j, p := p)
          ORDER BY i, j) AS m FROM ent),
      kf AS (SELECT CAST(count(*) AS INT) AS k FROM idx),
      pw AS (
        SELECT 0 AS it, list_transform(generate_series(1, k),
          x -> CAST(1.0 AS DOUBLE) / CAST(k AS DOUBLE)) AS pi
        FROM kf
        UNION ALL
        SELECT it + 1, list_transform(generate_series(0, k - 1), j ->
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_filter(m, e -> e['j'] = j),
              e -> pi[e['i'] + 1] * e['p'])),
            (acc, x) -> acc + x))
        FROM pw, packed, kf WHERE it < $MarkovIters),
      fin AS (
        SELECT idx.t AS event_type, idx.i, pi[idx.i + 1] AS stat
        FROM pw, idx WHERE it = $MarkovIters)
      SELECT event_type,
        CAST(coalesce(rs, 0) AS BIGINT) AS n_out,
        (round(stat, 6) + 0.0) AS stationary
      FROM fin LEFT JOIN rowsum ON rowsum.i = fin.i
      ORDER BY event_type"""

  /** Holt–Winters smoothing constants — exact SQL literal strings so
    * both engines parse the identical DOUBLE. */
  final val HwAlpha = "0.3"
  final val HwBeta = "0.1"
  final val HwGamma = "0.2"
  final val HwSeason = 7

  /** e28: ADDITIVE HOLT–WINTERS one-step-ahead forecast audit — the
    * level + trend + weekly-seasonality member of the forecasting
    * family (e25 = pure seasonal-naive, e27 = pure level): per type,
    * ŷ_t = l_{t−1} + b_{t−1} + s_{t−7} with the classic recurrences
    * l_t = α(y_t − s_{t−7}) + (1−α)(l_{t−1} + b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},
    * s_t = γ(y_t − l_t) + (1−γ)s_{t−7}, standard two-week init
    * (l = week-1 mean, b = (week-2 mean − week-1 mean)/7, s = week-1
    * deviations); forecasts EMIT from day 15 (past both init weeks —
    * no look-ahead in any emitted row).
    *
    * Determinism: the recurrence is double-valued and SEQUENTIAL, so
    * the whole per-type chain is ONE in-row `aggregate` fold over the
    * zero-filled calendar array (bounded state: l, b, a 7-slot season
    * array — t27's packed-DP discipline; the calendar is day-bounded,
    * never corpus-bounded) executing a fixed IEEE op sequence; the
    * oracle replays the IDENTICAL expression tree via a recursive CTE
    * stepping day by day — NOT list_reduce, whose double-field struct
    * accumulator is the DuckDB 1.0 bug q60 documented. Smoothing
    * constants ride exact literal strings cast to DOUBLE in both
    * engines. Outputs round-6 (yhat), roundz (err).
    *
    * Scale: one fact-scale count aggregate; per-type state is a
    * ≤(days) array (collect_list is calendar-bounded by construction);
    * everything after is (types × days)-bounded. */
  def holtWinters(spark: SparkSession, dir: String): DataFrame =
    holtWinters(Tables.load(spark, dir, "events"))

  def holtWinters(events: DataFrame): DataFrame = {
    val m = HwSeason
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val cal = span.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val byType = filled.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cnt"))))
        .as("dc"))
      .filter(size(col("dc")) >= 2 * m + 1)
      .select(col("event_type"),
        expr("transform(dc, x -> x.day)").as("days"),
        expr("transform(dc, x -> CAST(x.cnt AS DOUBLE))").as("ys"),
        expr("transform(dc, x -> x.cnt)").as("cs"),
        size(col("dc")).as("n"))
    def el(k: String) = s"element_at(ys, $k)"
    val w1 = (1 to m).map(k => el(k.toString)).mkString(" + ")
    val w2 = (m + 1 to 2 * m).map(k => el(k.toString)).mkString(" + ")
    val l0 = s"(($w1) / CAST(7.0 AS DOUBLE))"
    val b0 = s"((($w2) / CAST(7.0 AS DOUBLE) - $l0) / CAST(7.0 AS DOUBLE))"
    val s0 = (1 to m).map(k => s"${el(k.toString)} - $l0")
      .mkString("array(", ", ", ")")
    val su = s"element_at(acc.s, ((t - 1) % $m) + 1)"
    val y = el("t")
    val yhat = s"(acc.l + acc.b + $su)"
    val lN = s"(CAST($HwAlpha AS DOUBLE) * ($y - $su) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwAlpha AS DOUBLE)) " +
      s"* (acc.l + acc.b))"
    val bN = s"(CAST($HwBeta AS DOUBLE) * ($lN - acc.l) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwBeta AS DOUBLE)) * acc.b)"
    val sN = s"(CAST($HwGamma AS DOUBLE) * ($y - $lN) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwGamma AS DOUBLE)) * $su)"
    val fold = s"""aggregate(
      sequence(${m + 1}, n),
      named_struct(
        'l', $l0, 'b', $b0, 's', $s0,
        'out', CAST(array() AS array<struct<t:int, yhat:double>>)),
      (acc, t) -> named_struct(
        'l', $lN, 'b', $bN,
        's', transform(acc.s, (v, i) -> CASE WHEN i = (t - 1) % $m
               THEN $sN ELSE v END),
        'out', CASE WHEN t >= ${2 * m + 1} THEN concat(acc.out,
            array(named_struct('t', t, 'yhat', $yhat)))
          ELSE acc.out END),
      acc -> acc.out)"""
    byType
      .withColumn("o", explode(expr(fold)))
      .withColumn("yhat", round(col("o.yhat"), 6))
      .withColumn("cnt", element_at(col("cs"), col("o.t")))
      .withColumn("err", graft.GraftFunctions.roundz(
        col("cnt").cast("double") - col("yhat"), 6))
      .select(col("event_type"),
        date_format(element_at(col("days"), col("o.t")), "yyyy-MM-dd")
          .as("day"),
        col("cnt"), col("yhat"), col("err"),
        (abs(col("err")) > lit(3.0)
          * sqrt(greatest(col("yhat"), lit(0.0)))).as("alarm"))
      .orderBy("event_type", "day")
  }

  /** DuckDB oracle for [[holtWinters]] — identical zero-filled
    * calendar, identical two-week init, and the SAME IEEE expression
    * tree replayed day-by-day in a recursive CTE (one row per type per
    * day; list_reduce is avoided — its double-field struct accumulator
    * is the DuckDB 1.0 bug documented at q60). */
  def e28OracleSql: String = {
    val m = HwSeason
    def el(k: String) = s"CAST(ysl[$k] AS DOUBLE)"
    val w1 = (1 to m).map(k => el(k.toString)).mkString(" + ")
    val w2 = (m + 1 to 2 * m).map(k => el(k.toString)).mkString(" + ")
    val l0 = s"(($w1) / CAST(7.0 AS DOUBLE))"
    val b0 = s"((($w2) / CAST(7.0 AS DOUBLE) - $l0) / CAST(7.0 AS DOUBLE))"
    val s0 = (1 to m).map(k => s"${el(k.toString)} - $l0")
      .mkString("[", ", ", "]")
    // the recursive step advances to day u = t + 1
    val su = s"s[(((t + 1) - 1) % $m) + 1]"
    val y = el("t + 1")
    val yhat = s"(l + b + $su)"
    val lN = s"(CAST($HwAlpha AS DOUBLE) * ($y - $su) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwAlpha AS DOUBLE)) * (l + b))"
    val bN = s"(CAST($HwBeta AS DOUBLE) * ($lN - l) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwBeta AS DOUBLE)) * b)"
    val sN = s"(CAST($HwGamma AS DOUBLE) * ($y - $lN) " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST($HwGamma AS DOUBLE)) * $su)"
    s"""
      WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      series AS MATERIALIZED (
        SELECT event_type, list(cnt ORDER BY day) AS ysl,
          list(day ORDER BY day) AS daysl,
          CAST(count(*) AS INT) AS n
        FROM filled GROUP BY 1 HAVING count(*) >= ${2 * m + 1}),
      hw AS (
        SELECT event_type, $m AS t, $l0 AS l, $b0 AS b, $s0 AS s,
          CAST([] AS STRUCT(t INTEGER, yhat DOUBLE)[]) AS out
        FROM series
        UNION ALL
        SELECT hw.event_type, t + 1, $lN, $bN,
          list_transform(s, (v, i) ->
            CASE WHEN i = ((((t + 1) - 1) % $m) + 1) THEN $sN ELSE v END),
          CASE WHEN t + 1 >= ${2 * m + 1}
            THEN list_append(out,
              struct_pack(t := CAST(t + 1 AS INTEGER), yhat := $yhat))
            ELSE out END
        FROM hw JOIN series USING (event_type) WHERE t < n),
      fin AS (
        SELECT hw.event_type, unnest(out) AS o, daysl, ysl
        FROM hw JOIN series USING (event_type) WHERE t = n)
      SELECT event_type,
        strftime(daysl[o['t']], '%Y-%m-%d') AS day,
        CAST(ysl[o['t']] AS BIGINT) AS cnt,
        round(o['yhat'], 6) AS yhat,
        (round(CAST(ysl[o['t']] AS DOUBLE) - round(o['yhat'], 6), 6)
          + 0.0) AS err,
        abs(round(CAST(ysl[o['t']] AS DOUBLE) - round(o['yhat'], 6), 6)
          + 0.0) > 3.0 * sqrt(greatest(round(o['yhat'], 6), 0.0)) AS alarm
      FROM fin ORDER BY event_type, day"""
  }

  /** Lags reported by [[acf]]: 1–3 catch short memory, 7 and 14 the
    * weekly rhythm this event feed is expected to carry. FIXED BY
    * CONTRACT (the g1 class): the query semantics are "the sample
    * autocorrelation at exactly these lags". */
  final val AcfLags: Seq[Int] = Seq(1, 2, 3, 7, 14)

  /** e30: AUTOCORRELATION PANEL (the sample ACF) — the periodicity
    * detector beside the forecasters: e25/e28 ASSUME a weekly season;
    * this MEASURES it. Per event type, over the zero-filled daily
    * calendar (e27's spine — gap days are real zero-rate days), the
    * lag-k sample autocorrelation r_k = Σ_t c_t·c_{t+k} / Σ_t c_t²
    * with c_t = x_t − x̄, at the [[AcfLags]] lag grid: a feed with a
    * true weekly rhythm shows r_7, r_14 ≫ r_1, which is the
    * precondition a practitioner checks before trusting e25/e28.
    *
    * Determinism: x̄ rides the round-12 grid from the exact integer
    * count sum; centered values c_t are round-12; every product is
    * round-12 quantized into DECIMAL(38,12) so numerator and
    * denominator are order-free exact sums; r_k is ONE roundz-6
    * double division (legitimately negative at off-phase lags). A
    * constant series has zero variance → NULL acf in both engines.
    *
    * Scale shape: one fact-scale count aggregate (map-side combine);
    * the spine is (types × days)-bounded; ALL lags ride ONE window
    * sort per type (the leads share a window spec), and the stack
    * explode is lag-bounded. Nothing touches the fact table twice. */
  def acf(spark: SparkSession, dir: String): DataFrame =
    acf(Tables.load(spark, dir, "events"))

  def acf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val cal = span.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = graft.Ckpt(cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L))))
    val mean = filled.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("cnt")).cast("double")
          / count(lit(1)).cast("double"), 12).as("mu"))
    val cc = filled.join(broadcast(mean), "event_type")
      .withColumn("cc", round(col("cnt").cast("double") - col("mu"), 12))
    val w = Window.partitionBy("event_type").orderBy("day")
    val leads = AcfLags.foldLeft(cc)((df, k) =>
      df.withColumn(s"l$k", lead(col("cc"), k).over(w)))
    val stacked = leads.select(col("event_type"), col("n_days"), col("cc"),
      expr(s"stack(${AcfLags.size}, " +
        AcfLags.map(k => s"$k, l$k").mkString(", ") + ") AS (lag, lv)"))
    val d3812 = "decimal(38,12)"
    val num = stacked.filter(col("lv").isNotNull)
      .groupBy("event_type", "lag")
      .agg(first(col("n_days")).as("n_days"),
        sum(round(col("cc") * col("lv"), 12).cast(d3812)).as("num"))
    val den = cc.groupBy("event_type")
      .agg(sum(round(col("cc") * col("cc"), 12).cast(d3812)).as("den"))
    num.join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag"), col("n_days"),
        when(col("den") > 0, graft.GraftFunctions.roundz(
          col("num").cast("double") / col("den").cast("double"), 6))
          .as("acf"))
      .orderBy("event_type", "lag")
  }

  /** e31: CLASSICAL SEASONAL DECOMPOSITION (additive; the moving-
    * average decomposition STL descends from) — the explainer the
    * monitors assume: cnt_d = trend + seasonal + residual, with
    * trend = the centered 7-day moving average (NULL on the 3 edge
    * days each side — no partial-window bias), seasonal = the
    * mean-centered day-of-week mean of the detrended series, and the
    * residual alarmed at 3 population sigmas. e10 z-scores the RAW
    * counts (weekly rhythm inflates its sigma), e28 forecasts — this
    * EXPLAINS, which is what a practitioner reads before trusting
    * either.
    *
    * Determinism: day-of-week is the epoch-anchored mod
    * (days since Monday 1970-01-05, mod 7) — NEVER an engine
    * dayofweek(), whose week-start conventions differ; trend,
    * detrended values, seasonal means and the centering all ride the
    * round-12 grid with DECIMAL(38,12) order-free sums; the residual
    * and outputs are roundz-6; the alarm compares |resid| against
    * 3·sd of the ROUND-6 residuals (population), so both engines
    * branch on identical doubles.
    *
    * Scale shape: one fact-scale count aggregate; the spine, the
    * 7-row window, the dow/seasonal frames and the variance pass are
    * all (types × days)-bounded. */
  def decompose(spark: SparkSession, dir: String): DataFrame =
    decompose(Tables.load(spark, dir, "events"))

  /** The classical-decomposition front half shared by [[decompose]]
    * and [[stlDecompose]]: zero-filled calendar, epoch-anchored
    * day-of-week, centered 7-day MA trend, mean-centered round-12
    * day-of-week seasonal. Returns (tr, seas): the per-day frame with
    * `trend`/`detr` and the (event_type, dow, seasonal12) frame. */
  private def seasonalCore(events: DataFrame): (DataFrame, DataFrame) = {
    val d3812 = "decimal(38,12)"
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val cal = span.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = graft.Ckpt(cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("dow",
        pmod(datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-05"))),
          lit(7))))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val tr = filled
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("trend", when(col("n7") === 7,
        round(sum(col("cnt")).over(w7).cast("double") / lit(7.0), 12)))
      .withColumn("detr", round(col("cnt").cast("double") - col("trend"),
        12))
    val sdow = tr.filter(col("detr").isNotNull)
      .groupBy("event_type", "dow")
      .agg(round(sum(col("detr").cast(d3812)).cast("double")
        / count(lit(1)).cast("double"), 12).as("sraw"))
    val smean = sdow.groupBy("event_type")
      .agg(round(sum(col("sraw").cast(d3812)).cast("double")
        / count(lit(1)).cast("double"), 12).as("sm"))
    val seas = sdow.join(broadcast(smean), "event_type")
      .select(col("event_type"), col("dow"),
        round(col("sraw") - col("sm"), 12).as("seasonal12"))
    (tr, seas)
  }

  def decompose(events: DataFrame): DataFrame = {
    val d3812 = "decimal(38,12)"
    val (tr, seas) = seasonalCore(events)
    val joined = graft.Ckpt(tr
      .join(broadcast(seas), Seq("event_type", "dow"), "left")
      .withColumn("resid", when(col("trend").isNotNull,
        graft.GraftFunctions.roundz(col("cnt").cast("double")
          - col("trend") - col("seasonal12"), 6))))
    val sd = joined.filter(col("resid").isNotNull)
      .groupBy("event_type")
      .agg(round(sqrt(sum(round(col("resid") * col("resid"), 12)
          .cast(d3812)).cast("double")
        / count(lit(1)).cast("double")), 12).as("sd"))
    joined.join(broadcast(sd), "event_type", "left")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"),
        graft.GraftFunctions.roundz(col("trend"), 6).as("trend"),
        graft.GraftFunctions.roundz(col("seasonal12"), 6).as("seasonal"),
        col("resid"),
        coalesce(abs(col("resid")) > lit(3.0) * col("sd"), lit(false))
          .as("alarm"))
      .orderBy("event_type", "day")
  }

  /** Loess half-width of [[stlDecompose]]'s trend smoother: the
    * tricube window spans ±StlQ days, scaled by StlQ+1 so every
    * weight is a nonzero exact dyadic rational. */
  final val StlQ = 3

  /** Tricube weights w(o) = (1 − (|o|/(StlQ+1))³)³ at offsets
    * 0..StlQ. |o|/4 is a power-of-two division, so every weight (and
    * every w·o, w·o² constant folded from it) is EXACTLY
    * representable as a double — both engines hold the identical bit
    * patterns from literals rendered out of this one source. */
  private val stlW: IndexedSeq[Double] = (0 to StlQ).map { o =>
    val u = o.toDouble / (StlQ + 1).toDouble
    val t = 1.0 - u * u * u
    t * t * t
  }

  /** Exact decimal rendering of a dyadic-rational double — the one
    * source of truth both the engine literals and the oracle SQL
    * read. */
  private def dlit(v: Double): String =
    new java.math.BigDecimal(v).toPlainString

  /** e32: STL-STYLE DECOMPOSITION WITH A LOESS TREND (Cleveland et
    * al. 1990's structure, one pass) — e31's centered-MA trend is
    * undefined on the 3 edge days each side and follows outliers
    * linearly; STL proper replaces it with locally-weighted
    * regression. Steps: e31's provisional MA trend → mean-centered
    * day-of-week seasonal (SHARED code, bit-identical seasonal), then
    * the final trend = degree-1 tricube loess over the
    * DESEASONALIZED series (cnt − seasonal), evaluated at each day
    * via the closed-form 2×2 weighted normal equations (q61's
    * no-iterative-solver discipline): b = (Σw·Σwxy − Σwx·Σwy)/det,
    * trend = (Σwy − b·Σwx)/Σw with x = day offset ∈ [−3, 3]. Edge
    * days use the truncated window (loess's defining advantage: the
    * trend exists on EVERY day). Residual = cnt − trend − seasonal,
    * alarmed at 3 population sigmas (e31's gate).
    *
    * Determinism: the window sums are FIXED-ORDER in-row chains over
    * 7 lag/lead taps (offset −3 → +3), so the IEEE sequence is
    * identical in both engines; all tricube constants (and their
    * folded w·o, w·o² products) are exact dyadic rationals rendered
    * from [[stlW]]; the fit lands on the round-12 grid, outputs
    * roundz-6. On a rhythm-only series the deseasonalized input is
    * constant and the loess fit returns it EXACTLY (b = 0, a = the
    * constant) — the spec gates this parity against e31.
    *
    * Scale shape: e31's (types × days)-bounded frames plus ONE
    * window sort for all seven taps; the fit is a per-row projection
    * (no extra exchange, no iteration). */
  def stlDecompose(spark: SparkSession, dir: String): DataFrame =
    stlDecompose(Tables.load(spark, dir, "events"))

  def stlDecompose(events: DataFrame): DataFrame = {
    val d3812 = "decimal(38,12)"
    val (tr, seas) = seasonalCore(events)
    val dj = graft.Ckpt(tr
      .join(broadcast(seas), Seq("event_type", "dow"), "left")
      .withColumn("deseas", when(col("seasonal12").isNotNull,
        round(col("cnt").cast("double") - col("seasonal12"), 12))))
    val w = Window.partitionBy("event_type").orderBy("day")
    def nm(o: Int) = if (o < 0) s"ym${-o}" else s"y$o"
    var t = dj.withColumn(nm(0), col("deseas"))
    for (o <- -StlQ to StlQ if o != 0)
      t = t.withColumn(nm(o),
        if (o < 0) lag(col("deseas"), -o).over(w)
        else lead(col("deseas"), o).over(w))
    // fixed-order (−3 → +3) masked chains — the identical IEEE
    // sequence the oracle writes out longhand
    def chain(term: Int => Column): Column =
      (-StlQ to StlQ).map(o =>
        when(col(nm(o)).isNotNull, term(o)).otherwise(lit(0.0)))
        .reduce(_ + _)
    val fit = t
      .withColumn("sw", chain(o => lit(stlW(math.abs(o)))))
      .withColumn("swx", chain(o => lit(stlW(math.abs(o)) * o)))
      .withColumn("swy", chain(o => lit(stlW(math.abs(o))) * col(nm(o))))
      .withColumn("swxx", chain(o => lit(stlW(math.abs(o)) * o * o)))
      .withColumn("swxy",
        chain(o => lit(stlW(math.abs(o)) * o) * col(nm(o))))
      .withColumn("den",
        col("sw") * col("swxx") - col("swx") * col("swx"))
      .withColumn("bb", when(col("den") =!= lit(0.0),
        (col("sw") * col("swxy") - col("swx") * col("swy")) / col("den"))
        .otherwise(lit(0.0)))
      .withColumn("trend12", when(col("sw") > lit(0.0),
        round((col("swy") - col("bb") * col("swx")) / col("sw"), 12)))
    val joined = graft.Ckpt(fit
      .withColumn("resid",
        when(col("trend12").isNotNull && col("seasonal12").isNotNull,
          graft.GraftFunctions.roundz(col("cnt").cast("double")
            - col("trend12") - col("seasonal12"), 6))))
    val sd = joined.filter(col("resid").isNotNull)
      .groupBy("event_type")
      .agg(round(sqrt(sum(round(col("resid") * col("resid"), 12)
          .cast(d3812)).cast("double")
        / count(lit(1)).cast("double")), 12).as("sd"))
    joined.join(broadcast(sd), "event_type", "left")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"),
        graft.GraftFunctions.roundz(col("trend12"), 6).as("trend"),
        graft.GraftFunctions.roundz(col("seasonal12"), 6).as("seasonal"),
        col("resid"),
        coalesce(abs(col("resid")) > lit(3.0) * col("sd"), lit(false))
          .as("alarm"))
      .orderBy("event_type", "day")
  }

  /** DuckDB oracle for [[stlDecompose]] — identical seasonal prefix
    * (e31's oracle through `seas`), the same seven positional
    * lag/lead taps over the deseasonalized series, the identical
    * fixed-order masked sum chains with literals rendered from
    * [[stlW]], the same closed-form fit, roundz-6 outputs, 3-sigma
    * alarm. */
  def e32OracleSql: String = {
    def nm(o: Int) = if (o < 0) s"ym${-o}" else s"y$o"
    def caseChain(term: Int => String): String =
      (-StlQ to StlQ).map(o =>
        s"(CASE WHEN ${nm(o)} IS NOT NULL THEN ${term(o)} ELSE 0.0 END)")
        .mkString(" + ")
    val tapCols = (-StlQ to StlQ).map { o =>
      if (o == 0) "deseas AS y0"
      else if (o < 0) s"lag(deseas, ${-o}) OVER w AS ${nm(o)}"
      else s"lead(deseas, $o) OVER w AS ${nm(o)}"
    }.mkString(",\n          ")
    s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt,
          ((CAST(cal.day - DATE '1970-01-05' AS INT) % 7) + 7) % 7 AS dow
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      tr AS (
        SELECT event_type, day, cnt, dow,
          CASE WHEN count(*) OVER w7 = 7
            THEN round(CAST(sum(cnt) OVER w7 AS DOUBLE) / 7.0, 12)
            END AS trend
        FROM filled
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      trd AS (
        SELECT *, round(CAST(cnt AS DOUBLE) - trend, 12) AS detr
        FROM tr),
      sdow AS (
        SELECT event_type, dow,
          round(CAST(sum(CAST(detr AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 12) AS sraw
        FROM trd WHERE detr IS NOT NULL GROUP BY 1, 2),
      smean AS (
        SELECT event_type,
          round(CAST(sum(CAST(sraw AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 12) AS sm
        FROM sdow GROUP BY 1),
      seas AS (
        SELECT sdow.event_type, dow, round(sraw - sm, 12) AS seasonal12
        FROM sdow JOIN smean ON sdow.event_type = smean.event_type),
      dj AS (
        SELECT trd.event_type, day, cnt, trd.dow, seasonal12,
          CASE WHEN seasonal12 IS NOT NULL
            THEN round(CAST(cnt AS DOUBLE) - seasonal12, 12)
            END AS deseas
        FROM trd LEFT JOIN seas
          ON trd.event_type = seas.event_type AND trd.dow = seas.dow),
      taps AS (
        SELECT *,
          $tapCols
        FROM dj
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      sums AS (
        SELECT *,
          ${caseChain(o => dlit(stlW(math.abs(o))))} AS sw,
          ${caseChain(o => dlit(stlW(math.abs(o)) * o))} AS swx,
          ${caseChain(o => s"${dlit(stlW(math.abs(o)))} * ${nm(o)}")}
            AS swy,
          ${caseChain(o => dlit(stlW(math.abs(o)) * o * o))} AS swxx,
          ${caseChain(o => s"${dlit(stlW(math.abs(o)) * o)} * ${nm(o)}")}
            AS swxy
        FROM taps),
      fit AS (
        SELECT *, sw * swxx - swx * swx AS den FROM sums),
      fit2 AS (
        SELECT *, CASE WHEN den <> 0.0
          THEN (sw * swxy - swx * swy) / den ELSE 0.0 END AS bb
        FROM fit),
      fit3 AS (
        SELECT *, CASE WHEN sw > 0.0
          THEN round((swy - bb * swx) / sw, 12) END AS trend12
        FROM fit2),
      joined AS (
        SELECT event_type, day, cnt, trend12, seasonal12,
          CASE WHEN trend12 IS NOT NULL AND seasonal12 IS NOT NULL
            THEN (round(CAST(cnt AS DOUBLE) - trend12 - seasonal12, 6)
              + 0.0) END AS resid
        FROM fit3),
      sdt AS (
        SELECT event_type,
          round(sqrt(CAST(sum(CAST(round(resid * resid, 12)
              AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)), 12) AS sd
        FROM joined WHERE resid IS NOT NULL GROUP BY 1)
      SELECT joined.event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
        CASE WHEN trend12 IS NOT NULL THEN (round(trend12, 6) + 0.0) END
          AS trend,
        CASE WHEN seasonal12 IS NOT NULL
          THEN (round(seasonal12, 6) + 0.0) END AS seasonal,
        resid,
        coalesce(abs(resid) > 3.0 * sd, false) AS alarm
      FROM joined LEFT JOIN sdt ON joined.event_type = sdt.event_type
      ORDER BY joined.event_type, day"""
  }

  /** DuckDB oracle for [[decompose]] — identical zero-filled
    * calendar, epoch-anchored day-of-week, 7-row centered window,
    * round-12 seasonal grids, roundz-6 outputs, 3-sigma alarm. */
  def e31OracleSql: String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt,
          ((CAST(cal.day - DATE '1970-01-05' AS INT) % 7) + 7) % 7 AS dow
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      tr AS (
        SELECT event_type, day, cnt, dow,
          CASE WHEN count(*) OVER w7 = 7
            THEN round(CAST(sum(cnt) OVER w7 AS DOUBLE) / 7.0, 12)
            END AS trend
        FROM filled
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      trd AS (
        SELECT *, round(CAST(cnt AS DOUBLE) - trend, 12) AS detr
        FROM tr),
      sdow AS (
        SELECT event_type, dow,
          round(CAST(sum(CAST(detr AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 12) AS sraw
        FROM trd WHERE detr IS NOT NULL GROUP BY 1, 2),
      smean AS (
        SELECT event_type,
          round(CAST(sum(CAST(sraw AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 12) AS sm
        FROM sdow GROUP BY 1),
      seas AS (
        SELECT sdow.event_type, dow, round(sraw - sm, 12) AS seasonal12
        FROM sdow JOIN smean ON sdow.event_type = smean.event_type),
      joined AS (
        SELECT trd.event_type, day, cnt, trd.dow, trend, seasonal12,
          CASE WHEN trend IS NOT NULL
            THEN (round(CAST(cnt AS DOUBLE) - trend - seasonal12, 6)
              + 0.0) END AS resid
        FROM trd LEFT JOIN seas
          ON trd.event_type = seas.event_type AND trd.dow = seas.dow),
      sdt AS (
        SELECT event_type,
          round(sqrt(CAST(sum(CAST(round(resid * resid, 12)
              AS DECIMAL(38,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)), 12) AS sd
        FROM joined WHERE resid IS NOT NULL GROUP BY 1)
      SELECT joined.event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
        CASE WHEN trend IS NOT NULL THEN (round(trend, 6) + 0.0) END
          AS trend,
        CASE WHEN seasonal12 IS NOT NULL
          THEN (round(seasonal12, 6) + 0.0) END AS seasonal,
        resid,
        coalesce(abs(resid) > 3.0 * sd, false) AS alarm
      FROM joined LEFT JOIN sdt ON joined.event_type = sdt.event_type
      ORDER BY joined.event_type, day"""

  /** DuckDB oracle for [[acf]] — identical zero-filled calendar,
    * round-12 centering grid, exact-decimal product sums, one
    * roundz-6 division per (type, lag). */
  def e30OracleSql: String = {
    val leadCols = AcfLags
      .map(k => s"lead(cc, $k) OVER w AS l$k").mkString(",\n          ")
    val stacked = AcfLags.map(k =>
      s"SELECT event_type, n_days, cc, $k AS lag, l$k AS lv FROM leads")
      .mkString("\n        UNION ALL ")
    s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      mean AS (
        SELECT event_type, count(*) AS n_days,
          round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
            AS mu
        FROM filled GROUP BY 1),
      cc AS (
        SELECT filled.event_type, day, n_days,
          round(CAST(cnt AS DOUBLE) - mu, 12) AS cc
        FROM filled JOIN mean USING (event_type)),
      leads AS (
        SELECT event_type, n_days, cc,
          $leadCols
        FROM cc
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      stacked AS (
        $stacked),
      num AS (
        SELECT event_type, lag, any_value(n_days) AS n_days,
          sum(CAST(round(cc * lv, 12) AS DECIMAL(38,12))) AS num
        FROM stacked WHERE lv IS NOT NULL GROUP BY 1, 2),
      den AS (
        SELECT event_type,
          sum(CAST(round(cc * cc, 12) AS DECIMAL(38,12))) AS den
        FROM cc GROUP BY 1)
      SELECT num.event_type, CAST(lag AS INT) AS lag,
        CAST(n_days AS BIGINT) AS n_days,
        CASE WHEN den > 0 THEN (round(CAST(num AS DOUBLE)
          / CAST(den AS DOUBLE), 6) + 0.0) END AS acf
      FROM num JOIN den USING (event_type)
      ORDER BY event_type, lag"""
  }

  /** e34: RETROSPECTIVE MEAN-SHIFT CHANGEPOINT — the first split of
    * binary segmentation (Scott & Knott 1974; Sen & Srivastava 1975;
    * the seed step of Killick et al. 2012's PELT family): e24's CUSUM
    * answers "is the rate drifting NOW?" online; this answers the
    * post-hoc question "WHERE did the level shift?". Per event type,
    * over the zero-filled daily calendar (e27's skeleton — a silent
    * day is a real zero, not a missing row), the split day τ
    * maximizing the between-segment sum-of-squares reduction
    * gain(τ) = (S_L·n_R − S_R·n_L)² / (n_L·n_R·n), ties broken by the
    * EARLIEST day. Ships both segment means, the gain, and the gain's
    * share of the type's total SSE (the "how much of the variance is
    * this one break" dial; NULL for a constant series whose SSE is 0).
    *
    * Determinism: daily counts, prefix sums, and the gain's
    * numerator/denominator are exact integers (the squared difference
    * rides DECIMAL(38,0)/HUGEINT — |diff| ≤ S·n overflows int64
    * squared); gain is ONE double division phrased identically in
    * both engines, so the argmax comparator sees identical doubles;
    * the day tie-break makes the winner unique even under exact
    * gain ties (the all-constant series lands on day 1 in both
    * engines). Means/gain/share are single rounded expressions.
    *
    * Scale shape: one fact-scale count aggregate (map-side combine);
    * the calendar frame, prefix window, per-type totals, and the
    * argmax window are all (types × days)-bounded; output is one row
    * per type. Nothing iterated, nothing quadratic. */
  def changepoint(spark: SparkSession, dir: String): DataFrame =
    changepoint(Tables.load(spark, dir, "events"))

  /** [[changepoint]]'s core over a raw events frame — split out for
    * planted specs. */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val cal = span.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val filled = cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("day")
    val idx = filled
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("sl", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = filled.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("q"))
    val cand = idx.join(tot, "event_type")
      .filter(col("n") >= 2 && col("i") <= col("n") - 1)
      .withColumn("diff", (col("sl") * (col("n") - col("i"))
        - (col("s") - col("sl")) * col("i")).cast("decimal(19,0)"))
      .withColumn("gain", (col("diff") * col("diff")).cast("double")
        / (col("i") * (col("n") - col("i")) * col("n")).cast("double"))
    val sst = col("q").cast("double") -
      col("s").cast("double") * col("s").cast("double") /
        col("n").cast("double")
    cand
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("gain").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("tau_day"),
        col("n").as("n_days"),
        round(col("sl").cast("double") / col("i").cast("double"), 6)
          .as("mean_left"),
        round((col("s") - col("sl")).cast("double")
          / (col("n") - col("i")).cast("double"), 6).as("mean_right"),
        round(col("gain"), 6).as("gain"),
        when(sst > 0.0, round(col("gain") / sst, 6)).as("sse_share"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[changepoint]] — identical calendar skeleton,
    * exact integer prefix arithmetic, and argmax tie-break. */
  def e34OracleSql: String = s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM span),
      filled AS (
        SELECT cal.event_type, cal.day, coalesce(daily.cnt, 0) AS cnt
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day),
      idx AS (
        SELECT event_type, day, cnt,
          CAST(row_number() OVER w AS BIGINT) AS i,
          sum(cnt) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl
        FROM filled
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      tot AS (
        SELECT event_type, count(*) AS n, sum(cnt) AS s,
          sum(cnt * cnt) AS q
        FROM filled GROUP BY 1),
      cand AS (
        SELECT idx.event_type, day, i, sl, n, s, q,
          CAST(CAST(sl * (n - i) - (s - sl) * i AS HUGEINT)
              * CAST(sl * (n - i) - (s - sl) * i AS HUGEINT) AS DOUBLE)
            / CAST(i * (n - i) * n AS DOUBLE) AS gain
        FROM idx JOIN tot USING (event_type)
        WHERE n >= 2 AND i <= n - 1),
      best AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY gain DESC, day) AS rn
        FROM cand)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS tau_day,
        CAST(n AS BIGINT) AS n_days,
        round(CAST(sl AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_left,
        round(CAST(s - sl AS DOUBLE) / CAST(n - i AS DOUBLE), 6)
          AS mean_right,
        round(gain, 6) AS gain,
        CASE WHEN CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
            * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0.0 THEN
          round(gain / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
            * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS sse_share
      FROM best WHERE rn = 1 ORDER BY event_type"""

  /** e35: TREND / SEASONALITY STRENGTH (Wang, Smith & Hyndman 2006 —
    * the F_T/F_S features the tsfeatures/forecasting literature
    * standardized on): ONE comparable number per series for "how much
    * structure does the decomposition actually explain":
    * F_T = max(0, 1 − Var(R)/Var(T+R)) on the deseasonalized series
    * and F_S = max(0, 1 − Var(R)/Var(S+R)) on the detrended one, both
    * off e32's STL components. ≈1 = the component dominates, ≈0 = the
    * series is noise at that timescale — the triage dial that decides
    * WHICH types deserve a seasonal model (e25/e28) at all. A
    * constant comparison series (zero variance) has no strength to
    * measure → NULL identically in both engines.
    *
    * Determinism: e32's components are round-6 doubles on a shared
    * grid; the T+R / S+R sums are round-12 re-quantized per day;
    * every Σ and Σ² rides DECIMAL(38,12) order-free; each variance is
    * the identical Σx²/n − (Σx/n)² double expression and each
    * strength ONE rounded expression.
    *
    * Scale shape: e32's (types × days)-bounded frame, one group-by;
    * one row per type. */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame =
    strengthFromStl(stlDecompose(spark, dir))

  /** [[seasonalStrength]]'s core over [[stlDecompose]]'s output frame
    * — split out for planted specs. */
  def strengthFromStl(stl: DataFrame): DataFrame = {
    val d3812 = "decimal(38,12)"
    val q = stl.filter(col("resid").isNotNull)
      .select(col("event_type"), col("resid"),
        round(col("trend") + col("resid"), 12).as("dt"),
        round(col("seasonal") + col("resid"), 12).as("ds"))
    val agg = q.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(col("resid").cast(d3812)).as("sr"),
      sum(round(col("resid") * col("resid"), 12).cast(d3812)).as("qr"),
      sum(col("dt").cast(d3812)).as("st"),
      sum(round(col("dt") * col("dt"), 12).cast(d3812)).as("qt"),
      sum(col("ds").cast(d3812)).as("ss"),
      sum(round(col("ds") * col("ds"), 12).cast(d3812)).as("qs"))
    val n = col("n_days").cast("double")
    def vr(s: Column, q2: Column): Column =
      q2.cast("double") / n -
        (s.cast("double") / n) * (s.cast("double") / n)
    agg.select(col("event_type"), col("n_days"),
      when(vr(col("st"), col("qt")) > 0, round(greatest(lit(0.0),
        lit(1.0) - vr(col("sr"), col("qr")) / vr(col("st"), col("qt"))),
        6)).as("f_trend"),
      when(vr(col("ss"), col("qs")) > 0, round(greatest(lit(0.0),
        lit(1.0) - vr(col("sr"), col("qr")) / vr(col("ss"), col("qs"))),
        6)).as("f_season"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[seasonalStrength]] — e32's full STL oracle
    * as the component source, identical round-12 grids and variance
    * expressions. */
  def e35OracleSql: String = s"""
      WITH stl AS MATERIALIZED (${e32OracleSql}),
      q AS (
        SELECT event_type, resid,
          round(trend + resid, 12) AS dt,
          round(seasonal + resid, 12) AS ds
        FROM stl WHERE resid IS NOT NULL),
      agg AS (
        SELECT event_type, count(*) AS n_days,
          sum(CAST(resid AS DECIMAL(38,12))) AS sr,
          sum(CAST(round(resid * resid, 12) AS DECIMAL(38,12))) AS qr,
          sum(CAST(dt AS DECIMAL(38,12))) AS st,
          sum(CAST(round(dt * dt, 12) AS DECIMAL(38,12))) AS qt,
          sum(CAST(ds AS DECIMAL(38,12))) AS ss,
          sum(CAST(round(ds * ds, 12) AS DECIMAL(38,12))) AS qs
        FROM q GROUP BY 1)
      SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        CASE WHEN CAST(qt AS DOUBLE) / CAST(n_days AS DOUBLE)
            - (CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE))
            * (CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE)) > 0 THEN
          round(greatest(0.0, 1.0
            - (CAST(qr AS DOUBLE) / CAST(n_days AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE))
              * (CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE)))
            / (CAST(qt AS DOUBLE) / CAST(n_days AS DOUBLE)
              - (CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE))
              * (CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE)))), 6)
          END AS f_trend,
        CASE WHEN CAST(qs AS DOUBLE) / CAST(n_days AS DOUBLE)
            - (CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE))
            * (CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE)) > 0 THEN
          round(greatest(0.0, 1.0
            - (CAST(qr AS DOUBLE) / CAST(n_days AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE))
              * (CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE)))
            / (CAST(qs AS DOUBLE) / CAST(n_days AS DOUBLE)
              - (CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE))
              * (CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE)))), 6)
          END AS f_season
      FROM agg ORDER BY event_type"""

  /** e36: USER-ACTIVITY CONCENTRATION — the Gini coefficient (Gini
    * 1912; the Lorenz-curve summary, Lorenz 1905) plus the top-decile
    * share of per-user event counts: the "do 10% of the users
    * generate 90% of the traffic" number every engagement/abuse
    * dashboard leads with, the whole-population companion of e16's
    * per-segment RFM and e17's top-k lists. Gini from the sorted-rank
    * identity G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) (xᵢ ascending by
    * (count, user_id) — a total order, so ties cannot wobble the
    * sum); top_decile_share = the busiest ⌊n/10⌋ users' share of all
    * events (NULL below 10 users — no decile to take). Perfect
    * equality lands exactly 0; a single dominant user approaches
    * 1 − 1/n.
    *
    * Determinism: counts, ranks, and both numerators are exact
    * integer aggregates off the total (count, user_id) order; each
    * output is ONE double division rounded once, phrased identically
    * in both engines.
    *
    * Scale shape: one fact-scale count aggregate with map-side
    * combine; the rank window runs on the user-dimension frame (the
    * col*0 partition key keeps EliminateWindowPartitions happy — a
    * deliberate single-partition sort of an aggregate-bounded frame;
    * at a 10⁹-user scale the same rank comes from a distributed sort
    * + per-partition offset cumsum, e21's block-prefix pattern); the
    * final rollup is one row. */
  def e36Gini(spark: SparkSession, dir: String): DataFrame =
    giniFromCounts(Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("cnt")))

  /** [[e36Gini]]'s core over a (user_id, cnt) count frame — split out
    * for planted specs. */
  def giniFromCounts(per: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id") * 0)
      .orderBy("cnt", "user_id")
    val ranked = per.withColumn("i", row_number().over(w).cast("long"))
    val tot = ranked.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
    ranked.crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n_users"),
        max(col("s")).as("n_events"),
        sum((lit(2) * col("i") - col("n") - 1) * col("cnt")).as("gnum"),
        sum(when(col("i") > col("n") - expr("n div 10"), col("cnt"))
          .otherwise(0L)).as("topsum"))
      .select(col("n_users"), col("n_events"),
        round(col("gnum").cast("double")
          / (col("n_users") * col("n_events")).cast("double"), 6)
          .as("gini"),
        when(col("n_users") >= 10,
          round(col("topsum").cast("double")
            / col("n_events").cast("double"), 6)).as("top_decile_share"))
  }

  /** DuckDB oracle for [[e36Gini]] — identical total order, integer
    * rank identity, and rounded divisions. */
  def e36OracleSql: String = """
      WITH per AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      ranked AS (
        SELECT cnt,
          CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS i
        FROM per),
      tot AS (SELECT count(*) AS n, sum(cnt) AS s FROM ranked),
      agg AS (
        SELECT max(n) AS n_users, max(s) AS n_events,
          sum((2 * i - n - 1) * cnt) AS gnum,
          sum(CASE WHEN i > n - n // 10 THEN cnt ELSE 0 END) AS topsum
        FROM ranked, tot)
      SELECT CAST(n_users AS BIGINT) AS n_users,
        CAST(n_events AS BIGINT) AS n_events,
        round(CAST(gnum AS DOUBLE)
          / CAST(n_users * n_events AS DOUBLE), 6) AS gini,
        CASE WHEN n_users >= 10 THEN
          round(CAST(topsum AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
          END AS top_decile_share
      FROM agg"""

  /** e37: ACTIVITY TAIL-INDEX PANEL — the Hill estimator (Hill 1975)
    * over the top decile of per-user event counts plus the log-log
    * CCDF slope (the Pareto-plot regression), the "is this traffic
    * heavy-tailed, and how heavy" dial read next to e36's Gini before
    * sizing skew salting, rate limits, or per-user state budgets: a
    * Pareto tail with α ≤ 2 has infinite variance and a mean dominated
    * by whales, and every capacity rule of thumb changes.
    *
    * Hill α̂ = k / Σᵢ ln(x₍ₙ₋ᵢ₊₁₎/x₍ₙ₋ₖ₎) over the k = max(1, ⌊n/10⌋)
    * largest counts with threshold x₍ₙ₋ₖ₎ (the largest count NOT in
    * the tail); a perfectly flat tail (all top-k equal the threshold)
    * has no defined index and reports NULL, as does a corpus with no
    * below-tail threshold rank (n = 1). The CCDF slope is the OLS
    * slope of ln(#{cnt ≥ v}/n) on ln v over the DISTINCT observed
    * counts — on a true power law it estimates −α directly.
    *
    * Determinism: ranks and censuses are exact integers off the
    * (cnt, user_id) total order (e36's); each ln term is round-12
    * quantized and summed as DECIMAL (order-free); α and the slope are
    * single double expressions, the possibly-negative slope through
    * roundz. Divide guards are NULL-guards (when-absent ⇒ NULL), never
    * a bare /0 — ANSI Divide throws on DOUBLE zero too.
    *
    * Scale shape: one fact-scale count aggregate (map-side combine);
    * the rank window and the distinct-count CCDF window run on
    * aggregate-bounded frames with the col*0 single-partition key
    * (e36's contract — at 10⁹ users the same ranks come from a
    * distributed sort + block-prefix offsets); two one-row broadcast
    * folds; one-row output. */
  def e37TailIndex(spark: SparkSession, dir: String): DataFrame =
    tailIndexFromCounts(Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("cnt")))

  /** [[e37TailIndex]]'s core over a (user_id, cnt) count frame —
    * split out for planted heavy-tail/flat-tail specs. */
  def tailIndexFromCounts(per: DataFrame): DataFrame = {
    val d2512 = "decimal(25,12)"
    val d3812 = "decimal(38,12)"
    val w = Window.partitionBy(col("user_id") * 0)
      .orderBy("cnt", "user_id")
    val ranked = per.withColumn("i", row_number().over(w).cast("long"))
    val tot = ranked.agg(count(lit(1)).as("n"))
    val rk = ranked.crossJoin(broadcast(tot))
      .withColumn("k", greatest(lit(1L), expr("n div 10")))
    val xmin = rk.agg(max(when(col("i") === col("n") - col("k"),
      col("cnt"))).as("xmin"))
    val hill = rk.filter(col("i") > col("n") - col("k"))
      .crossJoin(broadcast(xmin))
      .agg(max(col("n")).as("n_users"), max(col("k")).as("k_tail"),
        max(col("xmin")).as("xmin_tail"),
        sum(round(log(col("cnt").cast("double")
          / col("xmin").cast("double")), 12).cast(d2512)).as("slog"))
    val dist = per.groupBy("cnt").agg(count(lit(1)).as("nv"))
    val wD = Window.partitionBy(col("cnt") * 0).orderBy(col("cnt").desc)
    val pts = dist.withColumn("cge", sum(col("nv")).over(wD))
      .crossJoin(broadcast(tot))
      .select(round(log(col("cnt").cast("double")), 12).as("x"),
        round(log(col("cge").cast("double") / col("n").cast("double")), 12)
          .as("y"))
    val ols = pts.agg(count(lit(1)).as("m"),
      sum(col("x").cast(d3812)).cast("double").as("sx"),
      sum(col("y").cast(d3812)).cast("double").as("sy"),
      sum(round(col("x") * col("y"), 12).cast(d3812))
        .cast("double").as("sxy"),
      sum(round(col("x") * col("x"), 12).cast(d3812))
        .cast("double").as("sxx"))
    hill.crossJoin(broadcast(ols))
      .select(col("n_users"), col("k_tail"), col("xmin_tail"),
        when(col("slog").cast("double") > 0.0,
          round(col("k_tail").cast("double")
            / col("slog").cast("double"), 6)).as("hill_alpha"),
        col("m").as("n_points"),
        when(col("m") >= 2,
          graft.GraftFunctions.roundz(
            (col("m").cast("double") * col("sxy") - col("sx") * col("sy"))
            / when(col("m").cast("double") * col("sxx")
                - col("sx") * col("sx") =!= 0.0,
              col("m").cast("double") * col("sxx")
                - col("sx") * col("sx")), 6)).as("ccdf_slope"))
  }

  /** DuckDB oracle for [[e37TailIndex]] — identical total order,
    * round-12 ln grids, and guarded divisions. */
  def e37OracleSql: String = """
      WITH per AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      ranked AS (
        SELECT cnt,
          CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS i
        FROM per),
      tot AS (SELECT count(*) AS n FROM per),
      rk AS (
        SELECT cnt, i, n, greatest(1, n // 10) AS k FROM ranked, tot),
      xmin AS (
        SELECT max(CASE WHEN i = n - k THEN cnt END) AS xmin FROM rk),
      hill AS (
        SELECT max(n) AS n_users, max(k) AS k_tail,
          max(xmin) AS xmin_tail,
          sum(CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(xmin AS DOUBLE)),
            12) AS DECIMAL(25,12))) AS slog
        FROM rk, xmin WHERE i > n - k),
      dist AS (SELECT cnt, count(*) AS nv FROM per GROUP BY 1),
      pts AS (
        SELECT round(ln(CAST(cnt AS DOUBLE)), 12) AS x,
          round(ln(CAST(sum(nv) OVER (ORDER BY cnt DESC) AS DOUBLE)
            / CAST(n AS DOUBLE)), 12) AS y
        FROM dist, tot),
      ols AS (
        SELECT count(*) AS m,
          CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxy,
          CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE)
            AS sxx
        FROM pts)
      SELECT CAST(n_users AS BIGINT) AS n_users,
        CAST(k_tail AS BIGINT) AS k_tail,
        CAST(xmin_tail AS BIGINT) AS xmin_tail,
        CASE WHEN CAST(slog AS DOUBLE) > 0.0 THEN
          round(CAST(k_tail AS DOUBLE) / CAST(slog AS DOUBLE), 6)
          END AS hill_alpha,
        CAST(m AS BIGINT) AS n_points,
        CASE WHEN m >= 2 THEN
          (round((CAST(m AS DOUBLE) * sxy - sx * sy)
            / (CASE WHEN CAST(m AS DOUBLE) * sxx - sx * sx <> 0.0
                 THEN CAST(m AS DOUBLE) * sxx - sx * sx END), 6) + 0.0)
          END AS ccdf_slope
      FROM hill, ols"""

  /** e38: TRANSITION-ENTROPY PANEL — the Shannon conditional entropy
    * of the next event type given the current one (Shannon 1948;
    * Cover & Thomas ch. 4: the entropy RATE of the empirical
    * first-order Markov chain under its empirical state distribution),
    * per state and corpus-wide: the predictability dial over e9's
    * transition matrix that e29's mixing analysis assumes someone
    * read first. H ≈ 0 means the journey is a script (every state has
    * one successor — prefetchable, cacheable, botlike); H near
    * ln(fan-out) means the next click is a coin toss. Per from-state:
    * H(next | s) = −Σ_t p(t|s)·ln p(t|s); the '*' row is
    * H(next | cur) = Σ_s p̂(s)·H(next | s), computed from the SAME
    * per-bigram rows (term = (n_st/N)·ln(n_st/tot_s)) so the weighting
    * is exact, not a rounded-row rollup.
    *
    * Determinism: bigram censuses are exact integers off the
    * (ts, event_id) per-user total order (e9's); each p·ln p term is
    * round-12 quantized and summed as DECIMAL (order-free); one roundz
    * per output row (a deterministic chain sums to exactly 0, where
    * the negation would otherwise mint −0.0).
    *
    * Scale shape: ONE fact-scale lead window partitioned by user (the
    * e2/e9 sessionization exchange) into a type²-bounded bigram
    * frame; everything after — the per-state window, both rollups,
    * the one-row total broadcast — is dimension-bounded. */
  def e38TransitionEntropy(spark: SparkSession, dir: String): DataFrame =
    transitionEntropyFromEvents(Tables.load(spark, dir, "events"))

  def transitionEntropyFromEvents(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transitionEntropyFromBigrams(events
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")))
  }

  /** [[e38TransitionEntropy]]'s core over a (from_type, to_type, n)
    * bigram-count frame — split out for planted chain/coin specs. */
  def transitionEntropyFromBigrams(pairs: DataFrame): DataFrame = {
    val d2512 = "decimal(25,12)"
    val wf = Window.partitionBy("from_type")
    val withTot = pairs.withColumn("tot", sum(col("n")).over(wf))
    def plogp(num: Column, den: Column): Column =
      round((col("n").cast("double") / den.cast("double"))
        * log(num.cast("double") / col("tot").cast("double")), 12)
        .cast(d2512)
    val per = withTot.groupBy("from_type")
      .agg(max(col("tot")).as("n_pairs"), count(lit(1)).as("n_next"),
        sum(plogp(col("n"), col("tot"))).as("s"))
    val nTot = pairs.agg(sum(col("n")).as("nn"))
    val corpus = withTot.crossJoin(broadcast(nTot))
      .agg(max(col("nn")).as("n_pairs"), count(lit(1)).as("n_next"),
        sum(plogp(col("n"), col("nn"))).as("s"))
      .select(lit("*").as("from_type"), col("n_pairs"), col("n_next"),
        col("s"))
    per.select(col("from_type"), col("n_pairs"), col("n_next"), col("s"))
      .unionByName(corpus)
      .select(col("from_type"), col("n_pairs"), col("n_next"),
        graft.GraftFunctions.roundz(-col("s").cast("double"), 6)
          .as("entropy"))
      .orderBy("from_type")
  }

  /** DuckDB oracle for [[e38TransitionEntropy]] — e9's bigram CTEs,
    * identical round-12 term grid and roundz negation. */
  def e38OracleSql: String = """
      WITH e AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
        FROM events),
      pairs AS (
        SELECT event_type AS from_type, to_type, count(*) AS n
        FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
      wt AS (
        SELECT from_type, n,
          sum(n) OVER (PARTITION BY from_type) AS tot
        FROM pairs),
      nn AS (SELECT sum(n) AS nn FROM pairs),
      per AS (
        SELECT from_type, max(tot) AS n_pairs, count(*) AS n_next,
          sum(CAST(round((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
            * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
            AS DECIMAL(25,12))) AS s
        FROM wt GROUP BY 1),
      corpus AS (
        SELECT '*' AS from_type, max(nn) AS n_pairs, count(*) AS n_next,
          sum(CAST(round((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
            * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
            AS DECIMAL(25,12))) AS s
        FROM wt, nn)
      SELECT from_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        CAST(n_next AS BIGINT) AS n_next,
        (round(-CAST(s AS DOUBLE), 6) + 0.0) AS entropy
      FROM (SELECT * FROM per UNION ALL SELECT * FROM corpus) u
      ORDER BY from_type"""

  /** Croston's smoothing constant — the standard slow-update default
    * for intermittent series; part of the operator contract (not a
    * JVM default), rendered identically into both engines. */
  final val CrostonAlpha = 0.1

  /** e39: CROSTON INTERMITTENT-DEMAND SMOOTHING (Croston 1972; the
    * Syntetos–Boylan 2005 bias-corrected twin rides along) — per-user
    * activity forecasting where e27/e28's dense-calendar smoothers are
    * WRONG by construction: a user active 2 days in 3 has a zero-
    * inflated series whose SES forecast collapses toward 0 between
    * visits. Croston separates the signal into TWO independent SES
    * recursions — demand SIZE over active days only, and the
    * INTER-DEMAND INTERVAL — and forecasts size/interval events/day;
    * SBA multiplies by (1 − α/2) to kill Croston's known positive
    * bias. The inventory-control classic, and exactly the per-user
    * "expected activity next day" a capacity/abuse model wants.
    *
    * NO zero-fill: the recursions only update on demand days, so the
    * series is GAP-ENCODED (intervals from day-number differences) —
    * a (users × calendar) zero-fill frame at 10⁹ users × years would
    * be the scale bug, and Croston's own structure makes it
    * unnecessary. Interval init = the first demand's 1-based offset
    * from the corpus calendar start; size init = the first demand.
    *
    * Determinism: the two recursions are IN-ROW index-order folds
    * over per-user day-sorted lists (q57's discipline — the IEEE
    * sequence is identical in both engines, no quantization needed);
    * they are deliberately SEPARATE single-accumulator folds because
    * DuckDB 1.0's list_reduce mis-evaluates double-field struct
    * accumulators (the q60 finding, documented at its call site).
    * Intervals ≥ 1 and init ≥ 1 keep every SES iterate ≥ 1, so the
    * final division needs no guard. Per-user fold length ≤ the
    * calendar span (bounded).
    *
    * Scale shape: one fact-scale (user, day) count aggregate
    * (map-side combine), one per-user collect of its own demand days
    * (lateness-bounded), two one-row calendar broadcasts; output =
    * user-dimension rows. */
  def e39Croston(spark: SparkSession, dir: String): DataFrame =
    crostonFromDaily(Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("q")))

  /** [[e39Croston]]'s core over a (user_id, day, q) demand frame —
    * split out for planted steady/intermittent/lumpy specs. */
  def crostonFromDaily(daily: DataFrame): DataFrame = {
    val a = CrostonAlpha
    val m0 = daily.agg(min(col("day")).as("day0"), max(col("day")).as("day1"))
    val seqd = daily.crossJoin(broadcast(m0))
      .select(col("user_id"),
        datediff(col("day"), col("day0")).cast("long").as("dn"), col("q"),
        (datediff(col("day1"), col("day0")) + 1).cast("long").as("span"))
    val per = seqd.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("dn"), col("q")))).as("ds"),
        max(col("span")).as("span"))
      .withColumn("nd", size(col("ds")))
      .withColumn("qs", transform(col("ds"),
        x => x.getField("q").cast("double")))
      .withColumn("dns", transform(col("ds"), x => x.getField("dn")))
      .withColumn("z", aggregate(
        slice(col("qs"), lit(2), col("nd") - 1),
        element_at(col("qs"), 1),
        (acc, q) => acc + lit(a) * (q - acc)))
      .withColumn("ivs", zip_with(
        slice(col("dns"), lit(2), col("nd") - 1),
        slice(col("dns"), lit(1), col("nd") - 1),
        (x, y) => (x - y).cast("double")))
      .withColumn("p", aggregate(col("ivs"),
        (element_at(col("dns"), 1) + 1).cast("double"),
        (acc, i) => acc + lit(a) * (i - acc)))
    per.select(col("user_id"),
      col("nd").cast("long").as("n_demand_days"),
      round(col("z"), 6).as("size_smooth"),
      round(col("p"), 6).as("interval_smooth"),
      round(col("z") / col("p"), 6).as("croston"),
      round(lit(1.0 - a / 2) * col("z") / col("p"), 6).as("croston_sba"),
      round(col("nd").cast("double") / col("span").cast("double"), 6)
        .as("demand_rate"))
      .orderBy("user_id")
  }

  /** DuckDB oracle for [[e39Croston]] — identical day-sorted lists,
    * the two separate single-accumulator folds, identical constants. */
  def e39OracleSql: String = s"""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS q
        FROM events GROUP BY 1, 2),
      m0 AS (SELECT min(day) AS day0, max(day) AS day1 FROM daily),
      seqd AS (
        SELECT user_id, datediff('day', day0, day) AS dn, q,
          datediff('day', day0, day1) + 1 AS span
        FROM daily, m0),
      per AS (
        SELECT user_id, max(span) AS span, count(*) AS nd,
          list_transform(list_sort(list(struct_pack(dn := dn, q := q))),
            x -> x['dn']) AS dns,
          list_transform(list_sort(list(struct_pack(dn := dn, q := q))),
            x -> CAST(x['q'] AS DOUBLE)) AS qs
        FROM seqd GROUP BY 1),
      folds AS (
        SELECT user_id, nd, span,
          list_reduce(list_prepend(qs[1], qs[2:]),
            (acc, q) -> acc + $CrostonAlpha * (q - acc)) AS z,
          list_reduce(list_prepend(CAST(dns[1] + 1 AS DOUBLE),
            list_transform(generate_series(2, CAST(nd AS INT)),
              t -> CAST(dns[t] - dns[t - 1] AS DOUBLE))),
            (acc, i) -> acc + $CrostonAlpha * (i - acc)) AS p
        FROM per)
      SELECT user_id, CAST(nd AS BIGINT) AS n_demand_days,
        round(z, 6) AS size_smooth,
        round(p, 6) AS interval_smooth,
        round(z / p, 6) AS croston,
        round(${1.0 - CrostonAlpha / 2} * z / p, 6) AS croston_sba,
        round(CAST(nd AS DOUBLE) / CAST(span AS DOUBLE), 6)
          AS demand_rate
      FROM folds ORDER BY user_id"""

  /** e40: WEEKLY TRAFFIC PROFILE — the day-of-week × hour heatmap
    * summary per event type that every ops/analytics dashboard leads
    * with, reduced to its decision numbers: the peak cell (when do we
    * provision for?), its traffic share, and the Shannon entropy of
    * the 168-cell distribution with its ln(cells)-normalized form
    * (≈1 = flat machine-like traffic, low = a spiky human/batch
    * pattern — the dial that separates organic usage from cron jobs
    * and instrumentation bugs). e31/e32 model the dow seasonality of
    * VOLUME over time; this profiles the steady-state weekly SHAPE.
    *
    * Determinism: dow = days-since-Monday-1970-01-05 mod 7 (e31's
    * engine-neutral convention — NEVER an engine dayofweek builtin,
    * whose 0/1-base and week start differ); cell censuses exact
    * integers; the peak is the (cnt DESC, dow, hour) total order;
    * entropy terms round-12 quantized and DECIMAL-summed (e38's
    * grid), roundz against the single-cell −0.0, the normalizer
    * NULL-guarded below 2 cells.
    *
    * Scale shape: ONE fact-scale (type, dow, hour) count aggregate
    * with map-side combine — the frame after it is ≤ types × 168
    * rows; everything else (per-type window, peak pick, rollup,
    * join, sort) is dimension-bounded. */
  def e40DowProfile(spark: SparkSession, dir: String): DataFrame =
    dowProfile(Tables.load(spark, dir, "events"))

  def dowProfile(events: DataFrame): DataFrame = {
    val d2512 = "decimal(25,12)"
    val cells = events.select(col("event_type"),
        pmod(datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-05"))), lit(7))
          .cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .groupBy("event_type", "dow", "hr").agg(count(lit(1)).as("cnt"))
    val wT = Window.partitionBy("event_type")
    val withTot = cells.withColumn("tot", sum(col("cnt")).over(wT))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("cnt").desc, col("dow"), col("hr"))
    val peak = withTot.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("dow").as("peak_dow"),
        col("hr").as("peak_hour"),
        round(col("cnt").cast("double") / col("tot").cast("double"), 6)
          .as("peak_share"))
    val ent = withTot.groupBy("event_type")
      .agg(max(col("tot")).as("n_events"), count(lit(1)).as("n_cells"),
        sum(round((col("cnt").cast("double") / col("tot").cast("double"))
          * log(col("cnt").cast("double") / col("tot").cast("double")),
          12).cast(d2512)).as("s"))
      .select(col("event_type"), col("n_events"), col("n_cells"),
        graft.GraftFunctions.roundz(-col("s").cast("double"), 6)
          .as("entropy"),
        when(col("n_cells") >= 2, graft.GraftFunctions.roundz(
          -col("s").cast("double") / log(col("n_cells").cast("double")),
          6)).as("entropy_norm"))
    ent.join(peak, "event_type").orderBy("event_type")
  }

  /** DuckDB oracle for [[dowProfile]] — e31's dow convention, e38's
    * entropy grid, the identical peak total order. */
  def e40OracleSql: String = """
      WITH cells AS (
        SELECT event_type,
          ((CAST(CAST(ts AS DATE) - DATE '1970-01-05' AS INT) % 7) + 7)
            % 7 AS dow,
          hour(CAST(ts AS TIMESTAMP)) AS hr, count(*) AS cnt
        FROM events GROUP BY 1, 2, 3),
      wt AS (
        SELECT *, sum(cnt) OVER (PARTITION BY event_type) AS tot
        FROM cells),
      peak AS (
        SELECT event_type, dow AS peak_dow, hr AS peak_hour,
          round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 6)
            AS peak_share
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY cnt DESC, dow, hr) AS rn FROM wt)
        WHERE rn = 1),
      ent AS (
        SELECT event_type, max(tot) AS n_events, count(*) AS n_cells,
          sum(CAST(round((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
            * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
            AS DECIMAL(25,12))) AS s
        FROM wt GROUP BY 1)
      SELECT e.event_type, CAST(n_events AS BIGINT) AS n_events,
        CAST(n_cells AS BIGINT) AS n_cells,
        (round(-CAST(s AS DOUBLE), 6) + 0.0) AS entropy,
        CASE WHEN n_cells >= 2 THEN
          (round(-CAST(s AS DOUBLE) / ln(CAST(n_cells AS DOUBLE)), 6)
            + 0.0) END AS entropy_norm,
        CAST(peak_dow AS BIGINT) AS peak_dow,
        CAST(peak_hour AS BIGINT) AS peak_hour, peak_share
      FROM ent e JOIN peak p ON p.event_type = e.event_type
      ORDER BY e.event_type"""
}
