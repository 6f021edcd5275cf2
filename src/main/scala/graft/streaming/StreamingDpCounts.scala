package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming DP count release — the streaming twin of
  * [[graft.ops.ProfileOps.dpCounts]]: per-group state is ONE long (the
  * running count), and every micro-batch re-emits the group's Laplace
  * release computed with the same seeded inverse-CDF draw as the batch
  * op — the noise depends only on the group key (+ salt), so the
  * release REFINES as the count grows and the final emission equals
  * the batch release over the full data. The count card keeps serving
  * mid-stream; StreamingBatchEquivalenceSpec chains the final state to
  * `privacy_dp_counts`' DuckDB oracle.
  *
  * The batch op's determinism caveat applies doubly here: the seeded
  * draw is the replay contract, and a production stream MUST also
  * release each group at most once per privacy budget — re-emission
  * per micro-batch spends ε each time under composition. This twin is
  * the MECHANISM demonstration; budget accounting is the caller's.
  */
object StreamingDpCounts {

  final case class KeyedRow(lang: String, source: String)
  final case class DpOut(lang: String, source: String, n: Long,
      noiseMicro: Long, nDpMicro: Long)

  /** JVM mirror of the batch op's seeded Laplace draw: 16-bit md5
    * uniform u = (2h+1)/2¹⁷, noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|) —
    * the RAW double, so both micro roundings below reproduce the
    * batch columns exactly (the batch rounds the raw noise twice:
    * once alone, once inside n + noise).
    */
  def noiseOf(key: String, epsilon: Double, salt: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$key".getBytes(StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
    val u = (h.toDouble * 2 + 1) / 131072.0
    val cen = u - 0.5
    -1.0 / epsilon * math.signum(cen) * math.log(1.0 - 2.0 * math.abs(cen))
  }

  /** The batch op's seed-string contract (ProfileOps.dpCounts keyStr):
    * each part length-prefixed (`<char_count>:<part>`, counting CODE
    * POINTS to match Spark's `length`), '|' between parts, NULL parts
    * sentinel-encoded as U+0000 — built from the TYPED key parts,
    * never re-parsed out of a joined string, and unambiguous even for
    * parts containing the separator (('a|b','s') and ('a','b|s') seed
    * differently).
    */
  def seedKey(lang: String, source: String): String =
    Seq(lang, source).map { v =>
      val p = if (v == null) "\u0000" else v
      s"${p.codePointCount(0, p.length)}:$p"
    }.mkString("|")

  def releaseStream(rows: Dataset[KeyedRow], epsilon: Double = 1.0,
      salt: String = "dp"): Dataset[DpOut] = {
    implicit val outEnc = Encoders.product[DpOut]
    implicit val stateEnc = Encoders.scalaLong
    implicit val keyEnc = Encoders.product[KeyedRow]

    rows
      .groupByKey(r => r)
      .flatMapGroupsWithState[Long, DpOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (key: KeyedRow, batch: Iterator[KeyedRow], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          val noise = noiseOf(seedKey(key.lang, key.source), epsilon, salt)
          def micro(x: Double): Long = BigDecimal(x * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          Iterator(DpOut(key.lang, key.source, n, micro(noise),
            micro(n.toDouble + noise)))
      }
  }
}
