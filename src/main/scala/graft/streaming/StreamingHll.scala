package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming HLL register maintenance — the streaming twin of
  * [[graft.ops.SketchOps.hllRegisters]]: each micro-batch folds its
  * keys' (idx, rank) draws into per-(group, idx) register maxima, and
  * every update emits the register's CURRENT value. max is commutative
  * and idempotent, so the final emission per register equals the batch
  * sketch of all the data under ANY arrival order or chunking — the
  * distinct-count sketch keeps serving mid-stream (its estimate only
  * tightens). State per key is ONE long: the hardest possible bounded-
  * state contract (at most m registers per group, each 8 bytes).
  *
  * The draw arithmetic is the plain-JVM mirror of the SQL expressions
  * (same md5, same bit split), so StreamingBatchEquivalenceSpec can
  * chain the final state to `profile_hll_registers`' DuckDB oracle.
  */
object StreamingHll {

  final case class KeyEvent(group: String, key: String)
  final case class RegisterOut(group: String, idx: Long, max_rank: Long)

  import graft.ops.SketchOps.{HllRankCap, HllW}

  /** JVM mirror of SketchOps.hllDraw/hllIdx/hllRank: md5 hex → first 8
    * chars as a 32-bit draw → (register index, rank).
    */
  def drawOf(key: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    val idx = h >>> HllW
    val w = h & ((1L << HllW) - 1)
    val rank =
      if (w == 0L) HllRankCap.toLong
      else HllRankCap.toLong - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (idx, rank)
  }

  def registerStream(events: Dataset[KeyEvent]): Dataset[RegisterOut] = {
    implicit val outEnc = Encoders.product[RegisterOut]
    implicit val stateEnc = Encoders.scalaLong
    implicit val drawEnc = Encoders.product[(String, Long, Long)]
    implicit val keyEnc = Encoders.product[(String, Long)]

    events
      .map { e =>
        val (idx, rank) = drawOf(e.key)
        (e.group, idx, rank)
      }
      .groupByKey(t => (t._1, t._2))
      .mapGroupsWithState[Long, RegisterOut](GroupStateTimeout.NoTimeout) {
        (k: (String, Long), batch: Iterator[(String, Long, Long)],
            state: GroupState[Long]) =>
          var m = state.getOption.getOrElse(0L)
          batch.foreach(t => m = math.max(m, t._3))
          state.update(m)
          RegisterOut(k._1, k._2, m)
      }
  }
}
