package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running totals on the Spark 4 `transformWithState` API — the
  * modern arbitrary-state operator (explicit named state cells, state
  * TTL, timers) that supersedes `mapGroupsWithState` for new designs.
  * [[StreamingBilling]] keeps the classic API deliberately (it mirrors
  * the reference fold); this operator is the forward-looking shape: a
  * continuously-updated per-user spend counter whose state cells can
  * expire on TTL — bounded state WITHOUT watermark semantics, the
  * retention contract billing counters want (an idle user's counter
  * ages out; an active one never does, which no watermark can express).
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not
  * run on the default HDFS-backed store.
  */
object StreamingTotals {

  case class Spend(user_id: Long, amount_cents: Long)
  case class RunningTotal(user_id: Long, n_events: Long, total_cents: Long)

  class TotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Spend, RunningTotal] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Spend],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      var (n, tot) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { r => n += 1; tot += r.amount_cents }
      st.update((n, tot))
      Iterator.single(RunningTotal(key, n, tot))
    }
  }

  /** One updated (n_events, total_cents) row per key per micro-batch
    * containing that key. `ttl` bounds how long an idle key's state
    * lives (TTLConfig.NONE = forever).
    */
  def runningTotals(
      spend: Dataset[Spend],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningTotal] = {
    import spend.sparkSession.implicits._
    spend
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }
}
