package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming weighted reservoir — the streaming twin of
  * [[graft.ops.SampleOps.weightedReservoir]] (Efraimidis-Spirakis A-ES):
  * each stratum's state is its CURRENT top-k rows by the deterministic
  * key score ln(u)/w, merged per micro-batch and re-emitted. The A-ES
  * key is the whole point for streaming: top-k-by-score is commutative,
  * idempotent, and arrival-order-independent, so the final emission per
  * stratum equals the batch sample of all the data under any chunking —
  * the audit sample keeps serving mid-stream and only refines.
  *
  * State per stratum is EXACTLY k (score, key, weight) triples —
  * bounded regardless of stream length (the unbounded-state trap of a
  * naive per-stratum sort never arises). The draw arithmetic is the
  * plain-JVM mirror of the SQL expressions (same md5-prefix uniform,
  * same ln(u)/w fixed order), so StreamingBatchEquivalenceSpec chains
  * the final state to `sample_weighted_reservoir`'s DuckDB oracle.
  *
  * CONTRACT — keys are unique within a stratum: the state merge
  * `.distinct`s (score, key, weight) triples, which is what makes the
  * operator IDEMPOTENT under at-least-once re-delivery (a replayed
  * micro-batch merges to the same state). The cost of that choice is
  * multiplicity: a stratum that legitimately contains the SAME
  * (key, weight) row twice collapses to one candidate here, while the
  * batch twin's row_number keeps both — dedupe upstream (or carry a
  * uniquifying sub-key) before sampling if duplicate rows are
  * meaningful. Idempotence was chosen deliberately: in a stream,
  * re-delivery is routine and true duplicate-row strata are not.
  */
object StreamingReservoir {

  final case class WeightedRow(stratum: String, key: Long, weight: Double)
  final case class SampleOut(stratum: String, key: Long, weight: Double,
      score: Double, rk: Long)

  /** JVM mirror of SampleOps.hashDraw (md5 hex prefix, 4 chars = 2
    * bytes = 16 bits) followed by the A-ES score ln((2h+1)/2·65536)/w.
    */
  def scoreOf(key: Long, weight: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes(StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
    math.log((h * 2 + 1).toDouble / 131072.0) / weight
  }

  /** Per-stratum running top-k; every update emits the stratum's
    * current sample (rk 1..k by score desc, key asc).
    */
  def sampleStream(rows: Dataset[WeightedRow], k: Int): Dataset[SampleOut] = {
    implicit val outEnc = Encoders.product[SampleOut]
    implicit val stateEnc = Encoders.kryo[List[(Double, Long, Double)]]
    implicit val keyEnc = Encoders.STRING

    rows
      .filter(_.weight > 0)
      .groupByKey(_.stratum)
      .flatMapGroupsWithState[List[(Double, Long, Double)], SampleOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (stratum: String, batch: Iterator[WeightedRow],
            state: GroupState[List[(Double, Long, Double)]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
            batch.map(r => (scoreOf(r.key, r.weight), r.key, r.weight)))
            .distinct
            .sortBy { case (s, key, _) => (-s, key) }
            .take(k)
          state.update(merged)
          merged.zipWithIndex.iterator.map { case ((s, key, w), i) =>
            SampleOut(stratum, key, w, s, i + 1L)
          }
      }
  }
}
