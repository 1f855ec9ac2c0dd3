package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream; `ts` duplicates `ts_us` as a timestamp so the
  * caller can set a watermark on it (event-time timeouts need one). */
case class SessEvent(user_id: Long, event_id: Long, ts_us: Long,
    ts: java.sql.Timestamp)

/** Per-user state carried across micro-batches. `curN == 0` marks a
  * tombstone: no session open, but `sessCount` is retained so numbering
  * continues if the user comes back (see tombstone TTL below). */
case class SessState(sessCount: Long, curStart: Long, curEnd: Long, curN: Long)

case class Session(user_id: Long, sess_id: Long, n_events: Long,
    start_us: Long, end_us: Long)

/**
 * Continuous gap-based sessionization — the streaming twin of
 * `q_events_sessionize`, built on `flatMapGroupsWithState` (the
 * KeyValueGroupedDataset custom-state path): state is one open session
 * per user, a session is emitted when a later event exceeds the gap
 * (in-batch or across batches) or when the event-time watermark passes
 * `last_event + gap` (idle user -> timeout closes the session, so state
 * NEVER outlives the watermark horizon — bounded like every other
 * stateful op in this engine).
 *
 * Scale shape: state is O(active users) × a 4-long record; each batch
 * shuffles once on user_id. In-batch disorder is handled by sorting the
 * (small) per-user-per-batch slice; cross-batch disorder is the
 * watermark's contract, same as the batch twin's single-shuffle window.
 * Session ids are per-user ordinals in event-time order — identical
 * numbering to the batch query when fed the same data, PROVIDED a user's
 * idle gaps stay under `tombstoneTtlUs`: a timeout-closed session leaves
 * a tombstone (curN=0) carrying the session count, so a returning user
 * continues numbering; the tombstone itself expires after the TTL (state
 * stays bounded), after which an extremely-long-idle user restarts at 1.
 */
object StreamingSessionize {

  /** Default tombstone retention: 7 days of event time. */
  val DefaultTombstoneTtlUs: Long = 7L * 86400L * 1000000L

  def sessions(events: Dataset[SessEvent], gapUs: Long,
      tombstoneTtlUs: Long = DefaultTombstoneTtlUs): Dataset[Session] = {
    import events.sparkSession.implicits._
    // setTimeoutTimestamp throws if the target is at/below the current
    // watermark (possible when a late event's curEnd lags it) — clamp.
    def armTimeout(state: GroupState[SessState], atMs: Long): Unit =
      state.setTimeoutTimestamp(
        math.max(atMs, state.getCurrentWatermarkMs() + 1L))
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.curN == 0L) {
              // tombstone TTL expired: the user has been idle past the
              // retention horizon — drop the numbering state for good
              state.remove()
              Iterator.empty
            } else {
              // watermark passed curEnd + gap: no event can extend this
              // session any more — close, emit, keep a tombstone so a
              // returning user's numbering continues from sessCount + 1
              state.update(SessState(st.sessCount + 1L, st.curEnd, st.curEnd, 0L))
              armTimeout(state, st.curEnd / 1000L + tombstoneTtlUs / 1000L + 1L)
              Iterator.single(Session(uid, st.sessCount + 1, st.curN, st.curStart, st.curEnd))
            }
          } else {
            val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L))
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            evs.foreach { e =>
              if (st.curN == 0L)
                st = SessState(st.sessCount, e.ts_us, e.ts_us, 1L)
              else if (e.ts_us - st.curEnd > gapUs) {
                out += Session(uid, st.sessCount + 1, st.curN, st.curStart, st.curEnd)
                st = SessState(st.sessCount + 1, e.ts_us, e.ts_us, 1L)
              } else
                st = SessState(st.sessCount, st.curStart, e.ts_us, st.curN + 1L)
            }
            state.update(st)
            // timeouts are in ms epoch; fire once the watermark passes the
            // open session's gap horizon
            armTimeout(state, st.curEnd / 1000L + gapUs / 1000L + 1L)
            out.iterator
          }
      }
  }
}
