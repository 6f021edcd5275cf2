package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.StateMachine
import graft.core.StateMachine.StateBuf

/** The billing state machine as an incremental streaming operator: the
  * SAME transition function as the batch kernel
  * ([[graft.core.StateMachine.step]]), folded event-at-a-time across
  * micro-batches with one small [[StateBuf]] per instance. Emits a
  * running-total row per instance per micro-batch (update mode).
  *
  * In-order delivery per instance is expected across batches (events are
  * sorted within each batch; cross-batch ordering is the upstream
  * source's watermark discipline — same contract as the reference's
  * `ORDER BY created_at`, model.py:215).
  */
object StreamingBilling {

  // event_id is the deterministic tiebreak for equal-timestamp events —
  // the batch kernel orders by (ts, id) (see RuntimeSql/commit 826e831);
  // the streaming fold must agree or equal-ts folds are nondeterministic.
  final case class VmAction(
      instance_uuid: String, ts_us: Long, action: String, message: String,
      event_id: Long = 0L)

  final case class VmRuntime(
      instance_uuid: String, current_state: String,
      running_us: Long, stopped_us: Long)

  def runtimeTotals(
      actions: Dataset[VmAction],
      startUs: Long,
      endUs: Long
  ): Dataset[VmRuntime] = {
    implicit val outEnc = Encoders.product[VmRuntime]
    implicit val bufEnc = Encoders.product[StateBuf]
    implicit val keyEnc = Encoders.STRING

    @inline def clamp(t: Long): Long = math.max(startUs, math.min(endUs, t))

    actions
      .groupByKey(_.instance_uuid)
      .mapGroupsWithState[StateBuf, VmRuntime](
        GroupStateTimeout.NoTimeout) {
        (uuid: String, batch: Iterator[VmAction], state: GroupState[StateBuf]) =>
          var buf = state.getOption.getOrElse(StateBuf.empty)
          batch.toSeq.sortBy(a => (a.ts_us, a.event_id)).foreach { a =>
            buf = StateMachine.step(buf, clamp(a.ts_us), a.action, a.message)
          }
          state.update(buf)
          // surface totals as if the open state closed now (at its entry
          // clamp) — the closed-through-window-end number comes from the
          // batch pipeline; this stream reports billable-so-far.
          VmRuntime(uuid, Option(buf.current).getOrElse("None"),
            buf.runningUs, buf.stoppedUs)
      }
  }
}
