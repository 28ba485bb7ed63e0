package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time processing over the `events` table — usable both as batch
  * transforms and as Structured Streaming stages (`withWatermark` is a
  * no-op on batch frames, so each transform is write-once/run-both-ways).
  *
  * Scale design: tumbling/sliding aggregation is a keyed two-phase hash
  * aggregate on (window, key) — partial aggregation bounds the exchange
  * by group cardinality; the watermark bounds streaming state. Session
  * windows use Spark's native `session_window` (state merges sorted runs
  * per key); the `flatMapGroupsWithState` variant demonstrates arbitrary
  * custom state for semantics the built-ins can't express.
  */
object EventStreams {

  /** Tumbling event-time windows: `(window_start, event_type, n, total)`.
    * On a stream, `watermark` bounds lateness and state. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Sliding windows (`width` every `slide`): each event lands in
    * width/slide windows. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Gap-based session windows per user: `(user_id, session_start, n_events,
    * sum_value)` — native `session_window` (gap-exclusive close). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream correlation: for each left event, matching right
    * events of the same user within `[0, within]` AFTER it — e.g. "view
    * followed by click within 15 minutes". Works identically on batch
    * frames. On streams, BOTH sides need the watermark (passed here) and
    * the time-range condition bounds the join state: rows age out of
    * state once the watermark passes their maximum match window —
    * without the bound, stream-stream join state grows forever.
    */
  def correlate(left: DataFrame, right: DataFrame, within: String = "15 minutes",
                watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("event_id").as("r_id"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within") &&
        col("l_id") =!= col("r_id"))
      .select(col("user_id"), col("l_id"), col("l_type"), col("r_id"), col("r_type"),
        col("l_ts").cast("long").as("l_ts"), col("r_ts").cast("long").as("r_ts"))
  }

  /** Watermark-bounded streaming deduplication by event id: duplicates
    * arriving within the watermark horizon are dropped with state that
    * ages out (unlike plain dropDuplicates, whose state never shrinks on
    * a stream). Batch: equivalent to dropDuplicates on the keys.
    */
  def dedupeWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark("event_id")
    else wm.dropDuplicates("event_id")
  }

  // ---- custom-state sessionization (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Long,
                        sum_value: Double)

  /** Arbitrary-state sessionizer: same gap semantics as [[sessionize]],
    * implemented with explicit per-key state — the pattern for session
    * logic the built-in can't express (e.g., cap on session length,
    * per-session distinct counts).
    *
    * Streaming (Append mode): a session is emitted exactly once, when the
    * watermark closes it — either an incoming batch advances the watermark
    * past `last + gap`, or the registered event-time timeout fires with no
    * further data for the key. Open sessions stay in state only. The input
    * stream MUST carry a watermark on `ts` (EventTimeTimeout requires one).
    *
    * Batch: the single invocation sees all of a key's events, so every
    * session is final — emit them all. Same code path, same fold.
    */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                         (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val streaming = events.isStreaming
    def emit(userId: Long, ss: List[SessionState]): Iterator[SessionOut] =
      ss.reverseIterator.map(s => SessionOut(userId, new Timestamp(s.start), s.n, s.sum))
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (streaming && state.hasTimedOut) {
            // Watermark passed every stored session's close time with no
            // new data for the key: flush and clear.
            val sessions = state.getOption.getOrElse(Nil)
            state.remove()
            emit(userId, sessions)
          } else {
            // Sort this batch's events by event time and fold into
            // gap-separated sessions (state list is newest-first).
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val sessions = sorted.foldLeft(state.getOption.getOrElse(Nil)) { (acc, e) =>
              val t = e.ts.getTime
              acc match {
                case head :: tail if t - head.last < gapMs =>
                  SessionState(math.min(head.start, t), math.max(head.last, t),
                    head.n + 1, head.sum + e.value) :: tail
                case _ =>
                  SessionState(t, t, 1, e.value) :: acc
              }
            }
            if (!streaming) {
              // Batch invocation is complete — everything is closed.
              state.update(sessions)
              emit(userId, sessions)
            } else {
              val wm = state.getCurrentWatermarkMs()
              val (open, closed) = sessions.partition(_.last + gapMs > wm)
              if (open.nonEmpty) {
                state.update(open)
                state.setTimeoutTimestamp(open.map(_.last).max + gapMs)
              } else {
                state.remove()
              }
              emit(userId, closed)
            }
          }
      }
  }
}
