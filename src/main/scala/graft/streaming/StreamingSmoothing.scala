package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponential smoothing — the incremental twin of
  * [[graft.ops.TimeSeriesOps.emaSmooth]]: each micro-batch's per-key
  * events fold in event-time order through the SAME scale-0 micro-long
  * recursion (s₀ = round(v₀·1e6), sₜ = round(0.5·vₜ·1e6 + 0.5·sₜ₋₁)),
  * with only the last smoothed value carried as per-key state — one
  * small case class per key, the bounded-state contract of every
  * streaming operator here.
  *
  * Identical arithmetic means the emitted stream equals the batch
  * operator's output whenever batches arrive in per-key event-time
  * order (the StreamingBatchEquivalenceSpec gate chains this to
  * `ts_ema`'s DuckDB oracle). Out-of-order arrivals WITHIN a
  * micro-batch are sorted locally (bounded by batch size); arrivals
  * that cross batches out of order are the caller's watermark problem,
  * as with every per-key fold in graft.streaming.
  */
object StreamingSmoothing {

  final case class ValueEvent(
      user_id: Long, ts_us: Long, event_id: Long, value: Double)

  final case class EmaState(last_ema_micro: Long)

  final case class EmaOut(user_id: Long, event_id: Long, ema_micro: Long)

  /** round(x) with Spark's exact-BigDecimal HALF_UP semantics — the
    * same integer every engine expression in the batch twin produces.
    */
  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  def emaStream(events: Dataset[ValueEvent]): Dataset[EmaOut] = {
    implicit val outEnc = Encoders.product[EmaOut]
    implicit val stateEnc = Encoders.product[EmaState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent], state: GroupState[EmaState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var prev = state.getOption
          val out = sorted.map { e =>
            val ema = prev match {
              case None => r0(e.value * 1e6)
              case Some(s) => r0(0.5 * e.value * 1e6 + 0.5 * s.last_ema_micro.toDouble)
            }
            prev = Some(EmaState(ema))
            EmaOut(userId, e.event_id, ema)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
