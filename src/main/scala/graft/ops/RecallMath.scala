package graft.ops

/** The OR-amplification decision arithmetic shared by the recall-
  * targeting operators ([[SimilarityOps.nearDupPairsLshAtRecall]] on
  * the hyperplane-table axis, [[DedupOps.minhashPairsAtRecall]] on the
  * MinHash-band axis). Both families amplify an independent per-unit
  * collision probability with an OR over `L` units, so recall follows
  * 1−(1−x)^L — the model the r11 frontier measurements ride to three
  * decimals at ×10 and ×30 (PLANS round 11).
  *
  * Everything here is INTEGER micro arithmetic with per-step floor:
  * m_k = ⌊m_{k−1}·m₁/10⁶⌋. No fractional pow/ln whose last ulp could
  * differ across engines — the whole decision (escalation included)
  * replays exactly in the DuckDB oracle's `//` integer division.
  */
object RecallMath {

  /** Predicted micro MISS at k calibration units, k = 1..kmax:
    * m_k = ⌊m_{k−1}·m₁/10⁶⌋ from the measured one-unit miss `m1`
    * (longs stay ≤ 10¹²; floor division is the cross-engine contract).
    */
  def missSchedule(m1: Long, kmax: Int): List[Long] = {
    require(m1 >= 0 && m1 <= 1000000L, s"m1 must be micro in [0,1e6], got $m1")
    require(kmax >= 1, s"kmax must be >= 1, got $kmax")
    (1 to kmax).toList.scanLeft(1000000L)((m, _) => m * m1 / 1000000L).drop(1)
  }

  /** Smallest k (in calibration units) whose predicted recall
    * 10⁶−m_k meets `targetMicro`, or None if even `kmax` units fall
    * short — the caller raises by name with the measured geometry.
    */
  def solveUnits(m1: Long, targetMicro: Long, kmax: Int): Option[Int] = {
    val missAt = missSchedule(m1, kmax)
    (1 to kmax).find(k => 1000000L - missAt(k - 1) >= targetMicro)
  }

  /** The continuous-geometry unit count an UNREACHABLE raise reports:
    * L ≈ calibUnits·ln(1−target)/ln(m₁/10⁶) — advisory text only (the
    * decision itself is the integer schedule above), so plain doubles
    * are fine here.
    */
  def adviseUnits(m1: Long, targetMicro: Long, calibUnits: Int): String =
    if (m1 >= 1000000L) "unbounded (the calibration pass caught NOTHING)"
    else math.ceil(calibUnits *
      math.log(1.0 - targetMicro / 1e6) / math.log(m1 / 1e6)).toLong.toString
}
