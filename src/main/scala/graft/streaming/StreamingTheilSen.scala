package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Theil-Sen — the streaming twin of
  * [[graft.ops.TimeSeriesOps.theilSen]]: each key's state is its point
  * buffer (capped at `maxPoints`, the same quadratic hot-key ceiling
  * the batch op enforces), and every micro-batch re-emits the EXACT
  * lower-median pairwise slope over the buffered points, computed in
  * the same fixed arithmetic as the batch plan — so once a key's
  * stream drains, its last emission equals the batch row, and
  * StreamingBatchEquivalenceSpec chains it to `ts_theil_sen`'s DuckDB
  * oracle.
  *
  * Why a buffer and not a sketch: the Theil-Sen median is not
  * mergeable (the median of pairwise slopes has no bounded-size exact
  * summary), so the exact streaming form IS the bounded buffer — the
  * cap is the honest statement of that, enforced by name exactly like
  * the batch guard instead of letting state grow unbounded. Keys are
  * assumed delivered exactly once (the buffer keeps multiplicity, so
  * a replayed micro-batch would double its points — the opposite
  * trade from [[StreamingReservoir]]'s idempotent dedup, chosen here
  * because the batch op's median DOES see duplicate points).
  */
object StreamingTheilSen {

  final case class Pt(key: Long, tsUs: Long, value: Double)
  final case class SlopeOut(key: Long, nPts: Long, nPairs: Long,
      slopeMicro: Long)

  /** JVM mirror of the batch in-row expansion: sort points
    * lexicographically (the batch sorts struct(t, v) arrays), expand
    * i<j pairs skipping equal timestamps, each slope in the one fixed
    * double order Δv / (Δt_us / 10⁶), lower median by position,
    * HALF_UP micro rounding (Spark SQL round semantics).
    */
  def theilSenOf(pts: Seq[(Long, Double)]): Option[SlopeOut] = {
    val s = pts.sorted
    val slopes = (for {
      i <- s.indices.iterator
      j <- (i + 1).until(s.length).iterator
      if s(j)._1 > s(i)._1
    } yield (s(j)._2 - s(i)._2) / ((s(j)._1 - s(i)._1).toDouble / 1000000.0))
      .toArray
    if (slopes.isEmpty) None
    else {
      java.util.Arrays.sort(slopes)
      val med = slopes((slopes.length + 1) / 2 - 1)
      Some(SlopeOut(-1L, s.length.toLong, slopes.length.toLong,
        BigDecimal(med * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
  }

  /** Per-key running slope; every update re-emits the key's current
    * (n_pts, n_pairs, slope_micro). A key whose buffer would exceed
    * `maxPoints` raises by name — the streaming mirror of the batch
    * hotKeyGuarded ceiling.
    */
  def slopeStream(rows: Dataset[Pt],
      maxPoints: Int = graft.ops.SessionOps.DefaultMaxQuadraticPerKey.toInt)
      : Dataset[SlopeOut] = {
    implicit val outEnc = Encoders.product[SlopeOut]
    implicit val stateEnc = Encoders.kryo[Vector[(Long, Double)]]
    implicit val keyEnc = Encoders.scalaLong

    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[Vector[(Long, Double)], SlopeOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Pt],
            state: GroupState[Vector[(Long, Double)]]) =>
          val merged = state.getOption.getOrElse(Vector.empty) ++
            batch.map(p => (p.tsUs, p.value))
          if (merged.length > maxPoints)
            throw new IllegalStateException(
              s"StreamingTheilSen: key $key holds ${merged.length} points, " +
                s"exceeding maxPoints=$maxPoints")
          state.update(merged)
          theilSenOf(merged).map(_.copy(key = key)).iterator
      }
  }
}
