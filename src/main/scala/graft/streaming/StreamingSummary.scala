package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming incremental aggregate-view maintenance — the streaming twin
  * of [[graft.ops.ChangeOps.microSummary]] + `mergeSummaries`: each
  * micro-batch folds into per-key mergeable state (n, Σ, min, max as
  * exact micro longs — the same algebraic combiners the batch merge
  * uses), and every update emits the key's CURRENT summary with the
  * derived mean. Because the state transition is the batch merge
  * operator applied one batch at a time, the final emission per key
  * equals the batch summary of all the data — any chunking, any arrival
  * order (the aggregates are commutative; nothing here needs event-time
  * order, unlike the EMA fold). The StreamingBatchEquivalenceSpec gate
  * chains this to `cdc_agg_merge`'s DuckDB full-recompute oracle.
  *
  * State per key is ONE fixed-size case class — the bounded-state
  * contract of every streaming operator here.
  */
object StreamingSummary {

  final case class ValueEvent(user_id: Long, value: Double)

  final case class SummaryState(
      n: Long, sum_micro: Long, min_micro: Long, max_micro: Long)

  final case class SummaryOut(
      user_id: Long, n: Long, sum_micro: Long, min_micro: Long,
      max_micro: Long, avg_micro: Long)

  /** round with Spark's exact-BigDecimal HALF_UP — the batch twin's
    * `round(·, 0)` on the same double.
    */
  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  def summaryStream(events: Dataset[ValueEvent]): Dataset[SummaryOut] = {
    implicit val outEnc = Encoders.product[SummaryOut]
    implicit val stateEnc = Encoders.product[SummaryState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SummaryState, SummaryOut](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent],
            state: GroupState[SummaryState]) =>
          var s = state.getOption.getOrElse(
            SummaryState(0L, 0L, Long.MaxValue, Long.MinValue))
          batch.foreach { e =>
            val v = r0(e.value * 1e6)
            s = SummaryState(s.n + 1, s.sum_micro + v,
              math.min(s.min_micro, v), math.max(s.max_micro, v))
          }
          state.update(s)
          SummaryOut(userId, s.n, s.sum_micro, s.min_micro, s.max_micro,
            r0(s.sum_micro.toDouble / s.n))
      }
  }
}
