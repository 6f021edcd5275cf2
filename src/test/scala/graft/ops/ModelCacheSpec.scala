package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The train-once contract: a key trains exactly once per JVM, distinct
  * keys train independently, and the cached value is returned verbatim
  * (determinism makes a hit indistinguishable from a retrain — this
  * pins the mechanism, the oracles pin the determinism).
  */
class ModelCacheSpec extends AnyFunSuite {

  test("trains once per key, returns the same artifact, keys are independent") {
    var trainsA = 0
    var trainsB = 0
    val keyA = s"mc-spec-a-${System.identityHashCode(this)}"
    val keyB = s"mc-spec-b-${System.identityHashCode(this)}"
    val a1 = ModelCache.cached(keyA) { trainsA += 1; Seq(1, 2, 3) }
    val a2 = ModelCache.cached(keyA) { trainsA += 1; Seq(9, 9, 9) }
    assert(trainsA == 1, "second call must not retrain")
    assert((a1 eq a2) && a1 == Seq(1, 2, 3), "hit returns the FIRST artifact")
    val b = ModelCache.cached(keyB) { trainsB += 1; Seq(4) }
    assert(trainsB == 1 && b == Seq(4), "a different key trains on its own")
  }

  test("a trainer may itself consult the cache (no computeIfAbsent reentrancy trap)") {
    val outer = s"mc-spec-outer-${System.identityHashCode(this)}"
    val inner = s"mc-spec-inner-${System.identityHashCode(this)}"
    // under computeIfAbsent this recursive shape threw
    // IllegalStateException when both keys landed in one hash bin; the
    // get/putIfAbsent form must simply train both
    val v = ModelCache.cached(outer) {
      val sub = ModelCache.cached(inner) { Seq(7) }
      sub.map(_ * 2)
    }
    assert(v == Seq(14))
    assert(ModelCache.cached(inner) { Seq(-1) } == Seq(7))
  }
}
