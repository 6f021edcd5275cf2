package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score — the incremental twin of
  * [[graft.ops.TimeSeriesOps.rollingZScore]]: per key, the trailing
  * `windowN` 6dp values ride as BOUNDED state (one fixed-capacity
  * buffer per key), and each arrival is scored against the buffer
  * BEFORE being appended — the batch operator's "a value never scores
  * against a baseline containing itself" frame, reproduced one event
  * at a time.
  *
  * Numeric parity with the batch twin is exact: the buffer stores
  * micro-scaled longs (= the batch's DECIMAL(18,6) values), the sums
  * are rebuilt as exact BigDecimals and cast to double, and the z
  * recipe applies the identical operation order — so the
  * StreamingBatchEquivalenceSpec gate chains this to `ts_anomaly`'s
  * DuckDB oracle. Per-key in-order arrival across batches is the
  * caller's watermark contract, as with the EMA fold.
  */
object StreamingAnomaly {

  final case class ValueEvent(
      user_id: Long, ts_us: Long, event_id: Long, value: Double)

  final case class WindowState(lastMicro: Seq[Long])

  final case class ZOut(
      user_id: Long, event_id: Long, z_micro: Long, is_anomaly: Long)

  private def r6micro(x: Double): Long =
    (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
      BigDecimal(1000000)).toLongExact

  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  def anomalyStream(events: Dataset[ValueEvent], windowN: Int = 20,
      zThresholdMicro: Long = 3000000L): Dataset[ZOut] = {
    implicit val outEnc = Encoders.product[ZOut]
    implicit val stateEnc = Encoders.product[WindowState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WindowState, ZOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent],
            state: GroupState[WindowState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var buf = state.getOption.map(_.lastMicro.toVector)
            .getOrElse(Vector.empty[Long])
          val out = Vector.newBuilder[ZOut]
          sorted.foreach { e =>
            if (buf.length == windowN) {
              // the batch recipe verbatim: exact decimal sums of the
              // trailing frame, identical double operation order
              val s1 = buf.map(m => BigDecimal(m, 6)).sum.toDouble
              val s2 = buf.map(m => BigDecimal(m, 6).pow(2)).sum.toDouble
              val nd = windowN.toDouble
              val variance = (s2 - s1 * s1 / nd) / (nd - 1.0)
              if (variance > 0) {
                val vd = BigDecimal(r6micro(e.value), 6).toDouble
                val z = r0((vd - s1 / nd) / math.sqrt(variance) * 1e6)
                out += ZOut(userId, e.event_id, z,
                  if (math.abs(z) >= zThresholdMicro) 1L else 0L)
              }
            }
            buf = (buf :+ r6micro(e.value)).takeRight(windowN)
          }
          state.update(WindowState(buf))
          out.result().iterator
      }
  }
}
