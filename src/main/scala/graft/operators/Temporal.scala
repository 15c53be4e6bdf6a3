package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import Exact._

/** Time-oriented operators over the `events` table: as-of join,
  * sessionization, and tumbling-window aggregation.
  */
object Temporal {

  // ---------------------------------------------------------------- q19
  /** As-of join: for every `error` event, the most recent `click` event of
    * the same user at-or-before its timestamp.
    *
    * Spark has no native as-of join; a range-join + per-row max would
    * explode quadratically on hot users at 100 TB. Instead: tag the two
    * streams, union, and carry the last click forward with a running
    * `last(_, ignoreNulls)` window — one shuffle by user, linear work.
    * Tie rules (deterministic): equal timestamps count as "before"
    * (tag sorts clicks first), and among equal-ts clicks the largest
    * event_id wins.
    */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select("event_id", "ts", "user_id", "event_type")
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    graft.api.Ops.asOfJoin(errors, clicks,
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        payloadCol = "event_id", outCol = "click_event_id")
      .select(col("event_id"), col("user_id"), col("ts"), col("click_event_id"))
      .orderBy("event_id")
  }

  private val q19Oracle =
    """SELECT e.event_id, e.user_id, e.ts,
      |  (SELECT c.event_id FROM events c
      |   WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
      |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_event_id
      |FROM events e WHERE e.event_type = 'error'
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Sessionization: gap > 30 min starts a new session; one row per
    * session with event count and duration. Classic lag + running-sum
    * boundary detection — one shuffle by user.
    */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select("user_id", "event_id", "ts")
    graft.api.Ops.sessionize(ev, keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id", gapMs = 1800000L)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_millis(col("ts").cast("timestamp"))) - min(unix_millis(col("ts").cast("timestamp")))).as("duration_ms"))
      .orderBy("user_id", "session_id")
  }

  private val q20Oracle =
    """WITH t AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM t)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |  CAST(MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS BIGINT) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Tumbling 1-hour window aggregation (batch form of the streaming
    * windowed agg; the Structured Streaming variant lives in
    * graft.streaming). */
  private def q21(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("hour", "event_type")

  private val q21Oracle =
    s"""SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
       |  ${oDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q97
  /** SLIDING window aggregation: `window(ts, size=1h, slide=30m)` — each
    * event lands in exactly size/slide = 2 overlapping windows. Spark
    * plans this as a generator (one output row per covering window)
    * feeding the same partial/final hash agg as the tumbling case — the
    * row amplification is the fixed size/slide factor, applied BEFORE the
    * map-side combine, so shuffle volume stays (windows × groups), not
    * (events × 2). The oracle reproduces the epoch-aligned window set by
    * unnesting the two candidate starts per event and range-filtering. */
  private def q97(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start", "event_type")

  private val q97Oracle =
    s"""WITH cand AS (
       |  SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS w_start,
       |    event_type, value, ts
       |  FROM events, (SELECT unnest([0, 1]) AS o) offs)
       |SELECT w_start, event_type, COUNT(*) AS n_events, ${oDsum("value")} AS sum_value
       |FROM cand
       |WHERE ts >= w_start AND ts < w_start + INTERVAL '1 hour'
       |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Native session windows: `session_window(ts, gap)` — the declarative
    * form of q20's hand-rolled gaps-and-islands sessionization, and the
    * one that carries over unchanged to Structured Streaming (session
    * windows with watermark-based state eviction). Spark semantics
    * (pinned by Round4OpsSpec): an event AT OR within `gap` of the
    * session's last event extends it — a window [t, t+gap) merges with a
    * window starting exactly at t+gap; window end = last event + gap. The
    * oracle replays exactly that (new session only when the gap is
    * strictly greater than 5 minutes). */
  private def q87(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select("user_id", "ts", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s_start")

  private val q87Oracle =
    s"""WITH t AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 300000 THEN 1 ELSE 0 END AS ns
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |s AS (
       |  SELECT user_id, ts, value,
       |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM t)
       |SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL 5 MINUTE AS s_end,
       |  COUNT(*) AS n_events, ${oDsum("value")} AS sum_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, s_start""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Bucketed interval join ([[graft.api.Ops.intervalJoin]]): events
    * falling inside the 10-minute window opened by each `error` event.
    * The plan is an equi-join on time-bucket ids + exact range refinement
    * — never a point×interval BroadcastNestedLoopJoin (PlanSpec pins
    * this). The oracle is the naive theta join: identical pairs. */
  private def q88(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select("event_id", "ts")
    val iv = Tables(spark, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("t0"),
        (col("ts") + expr("INTERVAL '10' MINUTE")).as("t1"))
    graft.api.Ops.intervalJoin(ev, iv, tsCol = "ts", startCol = "t0", endCol = "t1")
      .filter(col("event_id") =!= col("err_id"))
      .groupBy("err_id").agg(count(lit(1)).as("n_events"))
      .orderBy("err_id")
  }

  private val q88Oracle =
    """SELECT i.event_id AS err_id, COUNT(*) AS n_events
      |FROM events i JOIN events e
      |  ON e.ts >= i.ts AND e.ts < i.ts + INTERVAL 10 MINUTE
      |  AND e.event_id <> i.event_id
      |WHERE i.event_type = 'error'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Funnel analysis: signup → first subsequent purchase per user, with
    * conversion rate and mean time-to-convert. A conditional range join on
    * the (small) per-user firsts table — not a raw event×event join. */
  private def q50(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select("user_id", "event_type", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val firsts = signups
      .join(purchases, col("user_id") === col("p_user") && col("p_ts") >= col("signup_ts"), "left")
      .groupBy("user_id", "signup_ts")
      .agg(min(col("p_ts")).as("first_purchase_ts"))
    val ms: String => org.apache.spark.sql.Column = c => unix_millis(col(c).cast("timestamp"))
    firsts.agg(
      count(lit(1)).as("n_signup_users"),
      count(col("first_purchase_ts")).as("n_converted"),
      (count(col("first_purchase_ts")).cast("double") / count(lit(1))).as("conversion_rate"),
      // zero conversions would divide by zero (ANSI throw)
      when(count(col("first_purchase_ts")) > 0,
        sum(ms("first_purchase_ts") - ms("signup_ts")).cast("double") / count(col("first_purchase_ts")))
        .as("avg_ms_to_convert"))
  }

  private val q50Oracle =
    """WITH s AS (
      |  SELECT user_id, MIN(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
      |  FROM s LEFT JOIN events e
      |    ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
      |  GROUP BY s.user_id, s.signup_ts)
      |SELECT COUNT(*) AS n_signup_users,
      |  COUNT(first_purchase_ts) AS n_converted,
      |  CAST(COUNT(first_purchase_ts) AS DOUBLE) / COUNT(*) AS conversion_rate,
      |  CASE WHEN COUNT(first_purchase_ts) > 0
      |       THEN CAST(SUM(epoch_ms(first_purchase_ts) - epoch_ms(signup_ts)) AS DOUBLE)
      |            / COUNT(first_purchase_ts) END AS avg_ms_to_convert
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Time-series gap fill: a complete hourly spine per event type (types ×
    * generated hour range), LEFT-joined to the sparse hourly revenue, with
    * missing hours forward-filled from the last observed value (leading
    * gaps fall back to 0). The spine side is a broadcast of one bounds row
    * crossed with the tiny type dimension, so the heavy side — events —
    * is aggregated once and never expanded. */
  private def q76(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select("event_type", "ts", "value")
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
      .agg(dsum(col("value")).as("rev"))
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(
        col("event_type"), col("h"),
        col("rev").isNotNull.cast("int").as("observed"),
        coalesce(col("rev"), last(col("rev"), ignoreNulls = true).over(w), lit(0.0)).as("rev_filled"))
      .orderBy("event_type", "h")
  }

  private val q76Oracle =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, ${oDsum("value")} AS rev
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
       |types AS (SELECT DISTINCT event_type FROM events),
       |spine AS (
       |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
       |  FROM types, b),
       |j AS (SELECT s.event_type, s.h, hourly.rev
       |      FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h)
       |SELECT event_type, h,
       |  CAST(rev IS NOT NULL AS INTEGER) AS observed,
       |  COALESCE(rev,
       |    last_value(rev IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING),
       |    CAST(0 AS DOUBLE)) AS rev_filled
       |FROM j ORDER BY event_type, h""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q76_gap_fill", q76, Some(q76Oracle)),
    GraftQuery("q19_asof_join", q19, Some(q19Oracle)),
    GraftQuery("q20_sessionize", q20, Some(q20Oracle)),
    GraftQuery("q21_event_window_agg", q21, Some(q21Oracle)),
    GraftQuery("q97_sliding_window", q97, Some(q97Oracle)),
    GraftQuery("q50_funnel", q50, Some(q50Oracle)),
    GraftQuery("q87_session_window", q87, Some(q87Oracle)),
    GraftQuery("q88_interval_bucket_join", q88, Some(q88Oracle)))
}
