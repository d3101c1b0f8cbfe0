package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization of an event stream (gap-based sessions per key) —
  * two implementations with different expressiveness/cost trade-offs:
  *
  *   - [[sessionWindowAgg]]: Spark's built-in `session_window` —
  *     declarative, works identically in batch and streaming, state
  *     managed by the engine. Use when the per-session result is an
  *     aggregation Catalyst can express.
  *   - [[sessionizeWithState]]: `flatMapGroupsWithState` with
  *     event-time timeout — the custom-state escape hatch for session
  *     payloads built-ins can't express (here: per-session event-type
  *     counts plus first/last event ids). State per key is O(1); the
  *     watermark bounds how long an open session survives.
  */
object Sessionize {

  /** Gap-based session aggregation via the built-in session window.
    * Works on a batch OR streaming DataFrame with (`keyCol`, `timeCol`,
    * `valueCol`).
    */
  def sessionWindowAgg(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      gap: String = "30 minutes"
  ): DataFrame =
    df.groupBy(session_window(col(timeCol), gap).as("sw"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .select(
        col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String, event_id: Long)

  /** Columnar → typed adapter for [[sessionizeWithState]]: selects the
    * four SessionEvent columns and normalizes `ts` to TIMESTAMP first —
    * the encoder's `java.sql.Timestamp` field rejects a TIMESTAMP_NTZ
    * source outright (CANNOT_UP_CAST), and the driver's parquet ships
    * NTZ. Same cast contract as StreamingExtract's watermark
    * normalization: no-op on TZ, value-preserving on NTZ under the
    * pinned UTC session tz.
    */
  def sessionEvents(df: DataFrame): Dataset[SessionEvent] = {
    import df.sparkSession.implicits._
    df.select(
      col("user_id").cast("long"),
      col("ts").cast("timestamp"),
      col("event_type").cast("string"),
      col("event_id").cast("long")).as[SessionEvent]
  }
  final case class SessionState(
      startMs: Long, lastMs: Long, n: Int,
      firstEventId: Long, lastEventId: Long,
      typeCounts: Map[String, Int])
  final case class SessionOut(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      first_event_id: Long,
      last_event_id: Long,
      type_counts: Map[String, Int])

  /** Custom-state sessionizer: emits a closed session when the
    * event-time watermark passes `lastEvent + gap` (timeout), carrying
    * a payload (`typeCounts`, first/last ids) that `session_window`
    * aggregation cannot produce. Input must already have a watermark on
    * `ts`. Batches within a group arrive unordered — the fold is
    * min/max-based, not order-dependent.
    */
  def sessionizeWithState(
      events: Dataset[SessionEvent],
      gapMs: Long
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def startSession(e: SessionEvent): SessionState = {
      val ms = e.ts.getTime
      SessionState(ms, ms, 1, e.event_id, e.event_id, Map(e.event_type -> 1))
    }

    def extend(s: SessionState, e: SessionEvent): SessionState = {
      val ms = e.ts.getTime
      SessionState(
        math.min(s.startMs, ms), math.max(s.lastMs, ms), s.n + 1,
        if (ms < s.startMs) e.event_id else s.firstEventId,
        if (ms > s.lastMs) e.event_id else s.lastEventId,
        s.typeCounts.updated(e.event_type, s.typeCounts.getOrElse(e.event_type, 0) + 1))
    }

    def toOut(key: Long, s: SessionState): SessionOut = SessionOut(
      key,
      new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs),
      s.n, s.firstEventId, s.lastEventId, s.typeCounts)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastEvent + gap with no new data: close
            val out = state.getOption.map(toOut(key, _))
            state.remove()
            out.iterator
          } else {
            // fold the batch in event-time order, SPLITTING on gaps: an
            // event beyond lastMs + gap closes the open session (emitted
            // now, not on timeout) and starts a new one
            val closed = scala.collection.mutable.ListBuffer[SessionOut]()
            val last = it.toSeq.sortBy(_.ts.getTime).foldLeft(state.getOption) {
              case (None, e) => Some(startSession(e))
              case (Some(s), e) if e.ts.getTime > s.lastMs + gapMs =>
                closed += toOut(key, s)
                Some(startSession(e))
              case (Some(s), e) => Some(extend(s, e))
            }
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }
}
