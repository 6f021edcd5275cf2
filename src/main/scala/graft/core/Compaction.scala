package graft.core

import graft.core.Types.{BillingEvent, Runtime}
import graft.core.StateMachine.StateBuf

/** Event-log compaction (the K3 event-sourcing pattern at scale): an
  * instance's history before a compaction point `t0` collapses to just
  * its CURRENT STATE — transitions depend only on state, never on
  * accumulated time — so a billing window starting at or after `t0`
  * needs the snapshot plus the tail events, not the full log.
  *
  * At 100 TB this is the difference between scanning a month of events
  * and scanning years of them: run `snapshotState` once a day over the
  * closed prefix, store (instance_uuid, state) — a few bytes per
  * instance — and bill from snapshot + tail.
  *
  * Correctness argument: in `runtimeDuring` every event before the
  * window clamps to `start`, contributing a zero-duration transition;
  * only the state reached by the prefix matters, and it enters the
  * window at `start`. `SnapshotCompactionSpec` property-checks
  * snapshot+tail ≡ full fold on random logs.
  */
object Compaction {

  /** Fold the closed prefix (events at or before t0, sorted) down to the
    * state the machine is in at t0. Durations are irrelevant here.
    */
  def snapshotState(prefix: Iterable[BillingEvent]): Option[String] = {
    var buf = StateBuf.empty
    prefix.foreach(e => buf = StateMachine.step(buf, 0L, e.name, e.message))
    Option(buf.current)
  }

  /** Runtime over [startUs, endUs] from a snapshot taken at some
    * t0 <= startUs plus the tail events (those after t0, sorted).
    * Mirrors `StateMachine.runtimeDuring` seeded with the snapshot
    * state entered at the window start.
    */
  def runtimeFromSnapshot(
      snapshot: Option[String],
      tail: Iterable[BillingEvent],
      deletedAtUs: Option[Long],
      startUs: Long,
      endUs: Long
  ): Runtime = {
    @inline def clamp(t: Long): Long = math.max(startUs, math.min(endUs, t))
    var buf = snapshot match {
      case Some(s) => StateBuf(s, startUs, 0L, 0L)
      case None    => StateBuf.empty
    }
    tail.foreach(e => buf = StateMachine.step(buf, clamp(e.timeUs), e.name, e.message))
    deletedAtUs.foreach { d =>
      if (buf.current != null)
        buf = buf.exitAt(clamp(d)).copy(current = "Deleted", enteredAtUs = clamp(d))
    }
    if (buf.current != null) buf = buf.exitAt(endUs)
    Runtime(buf.runningUs, buf.stoppedUs)
  }
}
