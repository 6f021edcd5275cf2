package graft.core

import graft.core.Types.{BillingEvent, Runtime}

/** The billing state machine — semantic reference ("Option A" of SURVEY.md
  * §2e/K1). A pure fold over one instance's time-ordered event log yielding
  * microseconds spent Running / Stopped inside a billing window.
  *
  * Mirrors /root/reference/src/openstack_billing_db/model.py:90-156 exactly:
  *
  *  - each event time is clamped into `[startUs, endUs]` before any
  *    transition (model.py:98), so out-of-window events transition at the
  *    boundary with zero in-window duration;
  *  - `message == "Error"` always transitions to Error — even Error→Error —
  *    regardless of the action name (model.py:101-107);
  *  - an event whose trigger maps to the *current* state is ignored
  *    (model.py:114): no exit/enter, i.e. run-length semantics;
  *  - events whose action matches no trigger list (e.g. volume attach) are
  *    skipped entirely (model.py:109-117 falls through);
  *  - a non-null `deletedAt` exits the current state at clamp(deletedAt) and
  *    enters Deleted (model.py:119-125) — applied after ALL events, even
  *    ones later in time;
  *  - the final state is closed at the (unclamped) window end (model.py:127);
  *  - only Running and Stopped totals are surfaced (model.py:154-155);
  *    Shelved/Deleted/Error time is tracked but discarded.
  *
  * Documented deviation: the reference raises `AttributeError` when an
  * instance has no state-mapped events (current state None at model.py:124 /
  * 127). This engine yields `Runtime.zero` instead — a dead instance should
  * not kill a 100 TB job.
  */
object StateMachine {

  /** action name → state (model.py:141-150). */
  val TriggerToState: Map[String, String] = Map(
    "unshelve" -> "Running",
    "create"   -> "Running",
    "start"    -> "Running",
    "shelve"   -> "Shelved",
    "stop"     -> "Stopped",
    "delete"   -> "Deleted"
  )

  /** Fold `events` (MUST already be sorted by time, stably — model.py:215
    * `order by created_at`) into in-window Running/Stopped microseconds.
    */
  def runtimeDuring(
      events: Iterable[BillingEvent],
      deletedAtUs: Option[Long],
      startUs: Long,
      endUs: Long
  ): Runtime = {
    var runningUs = 0L
    var stoppedUs = 0L
    var current: String = null
    var enteredAtUs = 0L

    @inline def clamp(t: Long): Long = math.max(startUs, math.min(endUs, t))
    @inline def exitCurrent(t: Long): Unit = current match {
      case "Running" => runningUs += t - enteredAtUs
      case "Stopped" => stoppedUs += t - enteredAtUs
      case _         => () // Shelved / Deleted / Error time is discarded
    }

    val it = events.iterator
    while (it.hasNext) {
      val event = it.next()
      val t = clamp(event.timeUs)
      if (event.message == "Error") {
        if (current != null) exitCurrent(t)
        current = "Error"
        enteredAtUs = t
      } else {
        TriggerToState.get(event.name) match {
          case Some(state) =>
            if (current == null) { current = state; enteredAtUs = t }
            else if (state != current) {
              exitCurrent(t)
              current = state
              enteredAtUs = t
            }
          case None => () // unknown action: no transition
        }
      }
    }

    deletedAtUs.foreach { d =>
      if (current != null) {
        val t = clamp(d)
        exitCurrent(t)
        current = "Deleted"
        enteredAtUs = t
      }
    }

    if (current != null) exitCurrent(endUs)
    Runtime(runningUs, stoppedUs)
  }

  /** K2 — outage/interval subtraction (billing.py:88-102): total window
    * runtime minus the runtime re-computed inside each excluded interval.
    */
  def runtimeExcluding(
      events: Iterable[BillingEvent],
      deletedAtUs: Option[Long],
      startUs: Long,
      endUs: Long,
      excludedIntervals: Seq[(Long, Long)]
  ): Runtime = {
    val base = runtimeDuring(events, deletedAtUs, startUs, endUs)
    excludedIntervals.foldLeft(base) { case (acc, (s, e)) =>
      acc - runtimeDuring(events, deletedAtUs, s, e)
    }
  }
}
