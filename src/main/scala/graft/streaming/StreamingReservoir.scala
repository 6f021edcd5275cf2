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
  * MULTIPLICITY is tracked: state entries are (score, key, weight)
  * triples WITH A COUNT, so a stratum that legitimately contains the
  * same (key, weight) row twice keeps both copies — exactly like the
  * batch twin's row_number — and the state stays bounded (counts are
  * capped at k; a copy beyond k rows of equal-or-higher score can
  * never re-enter the sample, because rows only ever get ADDED above
  * it). Exactly-once state semantics come from Structured Streaming's
  * per-batch state versioning (a recovered batch replays against the
  * PRE-batch state), not from merge idempotence — so counting is both
  * safe under recovery and faithful to duplicate rows.
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
    * current sample (rk 1..k by score desc, key asc; duplicate rows
    * occupy consecutive ranks, as in the batch twin).
    *
    * State entries are ((score, key, weight), count): merging sums
    * counts per distinct triple, sorts, and keeps only the entries
    * needed to cover k rows (each count additionally capped at k) —
    * the state stays ≤ k rows-worth regardless of stream length.
    */
  def sampleStream(rows: Dataset[WeightedRow], k: Int): Dataset[SampleOut] = {
    implicit val outEnc = Encoders.product[SampleOut]
    implicit val stateEnc = Encoders.kryo[List[((Double, Long, Double), Long)]]
    implicit val keyEnc = Encoders.STRING

    rows
      .filter(_.weight > 0)
      .groupByKey(_.stratum)
      .flatMapGroupsWithState[List[((Double, Long, Double), Long)], SampleOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (stratum: String, batch: Iterator[WeightedRow],
            state: GroupState[List[((Double, Long, Double), Long)]]) =>
          val incoming = batch
            .map(r => (scoreOf(r.key, r.weight), r.key, r.weight))
            .toSeq.groupBy(identity).view.mapValues(_.size.toLong)
          val merged0 = (state.getOption.getOrElse(Nil) ++ incoming)
            .groupBy(_._1).view
            .mapValues(_.map(_._2).sum)
            .toList
            .sortBy { case ((s, key, _), _) => (-s, key) }
          // keep entries until k rows are covered; cap each count at k
          val (merged, _) = merged0.foldLeft(
            (List.empty[((Double, Long, Double), Long)], 0L)) {
            case ((acc, seen), (t, c)) =>
              if (seen >= k) (acc, seen)
              else (acc :+ (t, math.min(c, k.toLong)), seen + c)
          }
          state.update(merged)
          merged.iterator.flatMap { case ((s, key, w), c) =>
            Iterator.fill(math.min(c, k.toLong).toInt)(SampleOut(stratum, key, w, s, 0L))
          }.take(k).zipWithIndex.map { case (o, i) => o.copy(rk = i + 1L) }
      }
  }
}
