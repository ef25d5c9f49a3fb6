package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for streaming sessionization (mirrors the `events`
  * table columns the batch operator consumes). Top-level: encoder codegen
  * rejects non-public case classes. */
case class SessEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

/** Per-user session state: the aggregates of the session still accepting
  * events plus the 1-based per-user session counter. `open = false` is the
  * closed TOMBSTONE left after an event-time timeout — it carries only the
  * counter, so the user's NEXT session continues the batch-identical
  * numbering instead of restarting at 1 (the per-user monotone index the
  * output schema promises costs one tiny state row per ever-seen user;
  * removal would silently renumber). */
case class SessState(
    sessionId: Long, startUs: Long, endUs: Long, n: Long, cents: Long,
    open: Boolean = true)

/** One closed session — identical shape to [[graft.operators.Sessions]]
  * batch output, so the two faces are directly comparable. */
case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, value_cents: Long)

/**
 * Streaming face of [[graft.operators.Sessions.sessionize]]: gap-based
 * sessionization over an unbounded event stream with
 * `flatMapGroupsWithState` + event-time timeout.
 *
 * A session CLOSES two ways: a later in-stream event for the same user
 * arrives past the gap (emitted immediately, exactly the batch split), or
 * the WATERMARK passes the session's end + gap (event-time timeout — the
 * streaming-only part: an unbounded run must emit a user's last session
 * without waiting for that user's next event).
 *
 * Parity contract (asserted in StreamingSessionsSpec): for events
 * delivered in event-time order — any micro-batch slicing — the emitted
 * sessions equal the batch operator's output row-for-row. Events arriving
 * late-but-within-watermark still extend or merge into the OPEN session;
 * an event later than the watermark may attach to a successor session
 * that batch would have merged — the standard watermark trade-off,
 * documented rather than hidden.
 *
 * Scale: state per ACTIVE user is one fixed-size aggregate row (no event
 * buffering), dropped at timeout — state size tracks concurrent users
 * inside the gap window, not history.
 */
object StreamingSessions {

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  def sessionize(
      events: Dataset[SessEvent], gapSec: Long = 1800L,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.update(s.copy(open = false)) // tombstone keeps the counter
            Iterator.single(SessionOut(user, s.sessionId, s.n, s.startUs, s.endUs, s.cents))
          } else {
            // sort WITHIN the micro-batch: cross-batch order is the
            // delivery contract, in-batch order is ours to restore
            val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
            var open: Option[SessState] = state.getOption.filter(_.open)
            var lastId = state.getOption.map(_.sessionId).getOrElse(0L)
            val closed = Seq.newBuilder[SessionOut]
            evs.foreach { e =>
              val us = micros(e.ts)
              // HALF_UP like Spark's round() in the batch operator —
              // math.round is half-toward-+inf and diverges on negative
              // half-cents (-12.5 -> -12 instead of -13)
              val cents = java.math.BigDecimal.valueOf(e.value * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
              open match {
                case Some(s) if us - s.endUs <= gapUs =>
                  // a late-but-within-watermark event can precede the open
                  // session's start — min() it, or the merged session lies
                  open = Some(s.copy(startUs = math.min(s.startUs, us),
                    endUs = math.max(s.endUs, us), n = s.n + 1,
                    cents = s.cents + cents))
                case Some(s) =>
                  closed += SessionOut(user, s.sessionId, s.n, s.startUs, s.endUs, s.cents)
                  lastId = s.sessionId + 1
                  open = Some(SessState(lastId, us, us, 1L, cents))
                case None =>
                  lastId += 1
                  open = Some(SessState(lastId, us, us, 1L, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes end + gap (ms precision).
              // CLAMPED above the current eviction watermark: Spark 4
              // filters input by the PREVIOUS batch's late-event watermark
              // but validates timeouts against the NEWER eviction one, so
              // a straggler after an event-time jump > gap (idle resume,
              // backfill burst) would otherwise compute a timeout below
              // the watermark and kill the query with
              // IllegalArgumentException. The clamp closes such a session
              // at the next watermark advance — membership is unchanged
              // (assignment depends on the gap logic, not the timeout).
              val fireAt = s.endUs / 1000L + gapSec * 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(fireAt, state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }
}
