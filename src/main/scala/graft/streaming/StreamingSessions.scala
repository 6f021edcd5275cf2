package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2g: the reference is batch-
  * only; these are the streaming analogs the engine adds — K3's
  * "flatMapGroupsWithState would be the streaming analog" note made
  * real).
  *
  * Both keep per-key state bounded (one small case class per key) so a
  * 1000-executor streaming job shards by key with no unbounded buffers;
  * late data beyond the watermark is dropped by Spark before reaching
  * the state function.
  */
object StreamingSessions {

  final case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long)

  final case class SessionState(
      session_start_us: Long, last_ts_us: Long, n_events: Long)

  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  val DefaultGapUs: Long = graft.ops.SessionOps.DefaultGapUs

  /** Gap-based sessionization over a stream: a session closes when its
    * user is silent for `gapUs` of EVENT time. Requires the input to have
    * a watermark on an event-time column; emits closed sessions
    * (append mode) via event-time timeout.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs
  ): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.session_start_us, s.last_ts_us, s.n_events))
          } else {
            // micro-batches are unordered within the batch: sort locally
            // (bounded by batch size, not stream length)
            val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.last_ts_us <= gapUs =>
                  cur = Some(s.copy(last_ts_us = math.max(s.last_ts_us, e.ts_us),
                    n_events = s.n_events + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.session_start_us, s.last_ts_us, s.n_events)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when event time passes last_ts + gap
              state.setTimeoutTimestamp((s.last_ts_us + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
