package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The shared OR-amplification decision arithmetic. Property-tested
  * (seeded sampling — the offline cache has no scalatest-scalacheck
  * bridge) because THREE operators and two DuckDB replays must agree
  * with it bit-for-bit: any drift here is a cross-engine hash mismatch.
  */
class RecallMathSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(12)

  test("missSchedule is the per-step floor power and never re-rounds") {
    for (_ <- 1 to 500) {
      val m1 = rnd.nextLong(1000001L)
      val kmax = 1 + rnd.nextInt(16)
      val s = RecallMath.missSchedule(m1, kmax)
      assert(s.length == kmax)
      assert(s.head == m1)
      s.sliding(2).foreach {
        case List(a, b) => assert(b == a * m1 / 1000000L)
        case _ =>
      }
      // monotone non-increasing: more units never predict MORE miss
      assert(s.sliding(2).forall { case List(a, b) => b <= a; case _ => true })
    }
  }

  test("solveUnits returns the MINIMAL unit count meeting the target") {
    for (_ <- 1 to 500) {
      val m1 = rnd.nextLong(1000000L)
      val target = 500000L + rnd.nextLong(500000L)
      val kmax = 1 + rnd.nextInt(16)
      val s = RecallMath.missSchedule(m1, kmax)
      RecallMath.solveUnits(m1, target, kmax) match {
        case Some(k) =>
          assert(1000000L - s(k - 1) >= target)
          if (k > 1) assert(1000000L - s(k - 2) < target)
        case None =>
          assert(s.forall(m => 1000000L - m < target))
      }
    }
  }

  test("a zero-miss calibration solves at one unit; a total miss never solves") {
    assert(RecallMath.solveUnits(0L, 999999L, 8).contains(1))
    assert(RecallMath.solveUnits(1000000L, 500000L, 8).isEmpty)
    assert(RecallMath.adviseUnits(1000000L, 900000L, 8)
      .contains("unbounded"))
  }
}
