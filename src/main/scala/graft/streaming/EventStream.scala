package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the same event analytics as the batch
  * Temporal operators, expressed as streaming transforms. (The reference
  * repo, despite its name, has no streaming semantics at all — its
  * `tokio-stream` dependency is never imported; SURVEY.md header.)
  *
  * Transforms are defined against any DataFrame so the unit tests can
  * drive them from a file source (or MemoryStream) and batch callers can
  * reuse them verbatim.
  */
object EventStream {

  /** Tumbling 1-hour windowed counts with a 10-minute watermark for
    * late-data handling. Append-mode compatible. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))

  /** Native session windows on a stream: the declarative counterpart of
    * [[sessionize]] (and of the batch q87 query — same `session_window`
    * call, same gap semantics). The watermark closes a session once event
    * time passes its end, so per-user state holds only OPEN sessions —
    * bounded by activity, not stream lifetime. Append-mode compatible:
    * rows emit exactly once, when their session finalizes. */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id with BOUNDED state: duplicates are
    * only tracked while they can still arrive (inside the watermark delay),
    * so state size follows the dedup window, not the stream's lifetime —
    * the property that makes streaming dedup viable at 100 TB/day. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: every "view" is attached to the same
    * user's "click" at most 30 minutes earlier. Watermarks on BOTH inputs
    * plus the two-sided time-range condition let Spark evict join state as
    * event time advances (without them the join buffers both streams
    * forever). */
  def clickToView(clicks: DataFrame, views: DataFrame): DataFrame =
    clickToViewJoin(clicks, views, "inner")

  /** LEFT OUTER variant: every click emits — matched pairs as they join,
    * and clicks with NO view inside the attribution window emit once with
    * null view columns, as soon as the watermark proves no qualifying
    * view can still arrive (i.e. passes click time + 30 min + delay).
    * This is the auditable form of attribution: unmatched clicks land in
    * the output as first-class rows instead of silently vanishing, so
    * downstream conversion metrics see the full denominator. Same state
    * eviction as the inner form — the outer rows cost no extra state,
    * only the deferred emit. */
  def clickToViewOuter(clicks: DataFrame, views: DataFrame): DataFrame =
    clickToViewJoin(clicks, views, "leftOuter")

  private def clickToViewJoin(clicks: DataFrame, views: DataFrame,
      joinType: String): DataFrame = {
    val c = clicks.select(
      col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "30 minutes")
    val v = views.select(
      col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", "30 minutes")
    c.join(v, expr(
      "c_user = v_user AND v_ts >= c_ts AND v_ts <= c_ts + interval 30 minutes"), joinType)
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Stream-static enrichment: attach slowly-changing dimension
    * attributes to a stream by a broadcast equi-join — the production
    * "enrich events with the user/dim table" shape. The static side is
    * stateless for the stream (re-planned per micro-batch, so a dim
    * refresh is picked up on the next batch); broadcast keeps the stream
    * side shuffle-free, which is what makes this viable at full ingest
    * rate. Left join: events with no dim row pass through with nulls
    * rather than silently dropping (auditable, not lossy).
    *
    * The dim key is renamed to a reserved internal name before the join:
    * with `eventKey == dimKey` the naive `col(a) === col(b)` condition is
    * ambiguous (self-referencing) and `drop(dimKey)` would remove the
    * EVENT-side column too — renaming makes both resolve unambiguously. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame = {
    val k = "__graft_dim_key"
    require(!events.columns.contains(k) && !dim.columns.contains(k),
      s"column name $k is reserved by enrichWithDim")
    events.join(broadcast(dim.withColumnRenamed(dimKey, k)),
        col(eventKey) === col(k), "left")
      .drop(k)
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  final case class SessionState(sessionStartMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start_ms: Long, n_events: Long, duration_ms: Long)

  /** Stateful sessionization with flatMapGroupsWithState: a session closes
    * either when a later event of the same user arrives past the 30-minute
    * gap, or — for users who stop sending events — when the event-time
    * watermark passes last-event + gap (the timeout also frees the user's
    * state, so state size tracks *active* users, not all users ever seen).
    * Event-time (not processing-time) timeout keeps the query quiescent
    * between data batches and the semantics replay-deterministic. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60L * 1000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // watermark passed lastMs + gap with no new events: close out.
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.sessionStartMs, s.nEvents, s.lastMs - s.sessionStartMs))
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption
        val out = Seq.newBuilder[SessionOut]
        for (e <- sorted) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(s.copy(lastMs = t, nEvents = s.nEvents + 1))
            case Some(s) =>
              out += SessionOut(userId, s.sessionStartMs, s.nEvents, s.lastMs - s.sessionStartMs)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
