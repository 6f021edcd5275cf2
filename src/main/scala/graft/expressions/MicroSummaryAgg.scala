package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed-`Aggregator` extension lane (the third custom-aggregation
  * path beside the native Catalyst `AggregateFunction`
  * ([[KmvDistinct]]) and codegen scalar expressions ([[JaroWinkler]])):
  * a mergeable micro-unit summary written against the public
  * `org.apache.spark.sql.expressions.Aggregator` API and lifted to an
  * untyped column function with `functions.udaf` — the route an
  * application team without Catalyst internals would take.
  *
  * Same algebra and numeric contract as
  * [[graft.ops.ChangeOps.microSummary]]/`mergeSummaries` (exact micro
  * longs, scale-0 HALF_UP conversions, mean derived LAST from merged
  * state), so the two paths are mutually checkable — and the oracle for
  * its query is the same full recompute. `merge` is the partial-combine
  * Spark calls between map-side and final aggregation: state is one
  * fixed-size buffer however many rows fold in.
  */
final case class MicroSummaryBuf(n: Long, sum_micro: Long,
    min_micro: Long, max_micro: Long)

final case class MicroSummaryOut(n: Long, sum_micro: Long,
    min_micro: Long, max_micro: Long, avg_micro: Long)

object MicroSummaryAgg
    extends Aggregator[Double, MicroSummaryBuf, MicroSummaryOut] {

  type Buf = MicroSummaryBuf
  type Out = MicroSummaryOut
  private def Buf(n: Long, s: Long, mn: Long, mx: Long) =
    MicroSummaryBuf(n, s, mn, mx)
  private def Out(n: Long, s: Long, mn: Long, mx: Long, avg: Long) =
    MicroSummaryOut(n, s, mn, mx, avg)

  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  override def zero: Buf = Buf(0L, 0L, Long.MaxValue, Long.MinValue)

  override def reduce(b: Buf, value: Double): Buf = {
    val v = r0(value * 1e6)
    Buf(b.n + 1, b.sum_micro + v,
      math.min(b.min_micro, v), math.max(b.max_micro, v))
  }

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.n + b.n, a.sum_micro + b.sum_micro,
      math.min(a.min_micro, b.min_micro),
      math.max(a.max_micro, b.max_micro))

  override def finish(b: Buf): Out =
    Out(b.n, b.sum_micro, b.min_micro, b.max_micro,
      if (b.n == 0) 0L else r0(b.sum_micro.toDouble / b.n))

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}
