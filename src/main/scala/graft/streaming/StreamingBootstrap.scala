package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Poisson-bootstrap state maintenance — the streaming twin
  * of [[graft.ops.ExperimentOps.bootstrapCi]]'s replicate moments: each
  * micro-batch folds its rows' hash-derived Poisson(1) multiplicities
  * into per-replicate (Σ k·v_micro, Σ k) state, and every update emits
  * the replicate's CURRENT moments. Addition is commutative, so the
  * final state per replicate equals the batch aggregation under any
  * arrival order or chunking — the live confidence interval only
  * needs the B-row state read at serve time. State per replicate is
  * two longs; values fold as exact 6dp-micro longs (the batch twin's
  * DECIMAL sums at the same scale), so the equivalence spec chains the
  * final moments to the oracle-checked batch replicate means.
  */
object StreamingBootstrap {

  final case class ValueEvent(key: String, value: Double)
  final case class ReplicateState(sum_vk_micro: Long, n_k: Long)
  final case class ReplicateOut(b: Int, sum_vk_micro: Long, n_k: Long)

  import graft.ops.ExperimentOps.PoissonThresholds

  /** JVM mirror of the batch draw: the 16-bit slice (b mod 8) of
    * md5(key:(b div 8)) — eight replicate draws per digest —
    * multiplicity = #{thresholds ≤ draw}.
    */
  def multOf(key: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key:${b / 8}".getBytes("UTF-8"))
    val o = (b % 8) * 2
    val u = ((d(o) & 0xffL) << 8) | (d(o + 1) & 0xffL)
    PoissonThresholds.count(t => u >= t).toLong
  }

  private def vMicro(v: Double): Long = {
    val r6 = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    (r6 * BigDecimal(1000000)).toLongExact
  }

  def replicateStream(events: Dataset[ValueEvent], b: Int): Dataset[ReplicateOut] = {
    implicit val outEnc = Encoders.product[ReplicateOut]
    implicit val stEnc = Encoders.product[ReplicateState]
    implicit val rowEnc = Encoders.product[(Int, Long, Long)]
    implicit val keyEnc = Encoders.scalaInt

    events
      .flatMap { e =>
        val vm = vMicro(e.value)
        (0 until b).map(i => (i, multOf(e.key, i) * vm, multOf(e.key, i)))
      }
      .groupByKey(_._1)
      .mapGroupsWithState[ReplicateState, ReplicateOut](
        GroupStateTimeout.NoTimeout) {
        (rep: Int, batch: Iterator[(Int, Long, Long)],
            state: GroupState[ReplicateState]) =>
          var s = state.getOption.getOrElse(ReplicateState(0L, 0L))
          batch.foreach { t =>
            s = ReplicateState(s.sum_vk_micro + t._2, s.n_k + t._3)
          }
          state.update(s)
          ReplicateOut(rep, s.sum_vk_micro, s.n_k)
      }
  }
}
