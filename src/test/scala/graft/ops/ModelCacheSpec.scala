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

  test("sessionCached keys by applicationId and evictSession drops the session's entries") {
    val spark = graft.SparkTestSession.spark
    val appId = spark.sparkContext.applicationId
    val key = s"mc-spec-df-${System.identityHashCode(this)}"
    var builds = 0
    val d1 = ModelCache.sessionCached(spark, key) {
      builds += 1; spark.range(3).toDF().localCheckpoint()
    }
    val d2 = ModelCache.sessionCached(spark, key) {
      builds += 1; spark.range(9).toDF().localCheckpoint()
    }
    assert(builds == 1 && (d1 eq d2),
      "a session-scoped artifact builds once per (appId, key)")
    // the key embeds the STABLE applicationId, not an identity hash a
    // GC could recycle (r12 advice)
    assert(ModelCache.contains(s"__session|$appId|$key"))
    assert(ModelCache.listenerRegisteredFor(appId),
      "the evict-on-stop listener registers on first use")
    // the listener path, driven directly (a second local SparkContext
    // cannot be stopped inside the shared-session test JVM)
    ModelCache.evictSession(appId)
    assert(!ModelCache.contains(s"__session|$appId|$key"),
      "evictSession must drop every entry the session owns")
    assert(ModelCache.listenerRegisteredFor(appId),
      "the listener registration is NOT an evictable artifact: it " +
        "tracks a fact about the SparkContext's bus, and dropping it " +
        "would re-register a duplicate listener on the next " +
        "sessionCached call (r13 advice: slow leak under the bench's " +
        "evict knob)")
    val d3 = ModelCache.sessionCached(spark, key) {
      builds += 1; spark.range(5).toDF().localCheckpoint()
    }
    assert(builds == 2 && d3.count() == 5,
      "after eviction the artifact rebuilds cleanly")
    ModelCache.evictSession(appId)
  }

  test("evictPrefix drops matching keys only") {
    val p = s"mc-spec-pfx-${System.identityHashCode(this)}"
    ModelCache.cached(s"$p|a") { Seq(1) }
    ModelCache.cached(s"$p|b") { Seq(2) }
    ModelCache.cached(s"other-$p") { Seq(3) }
    ModelCache.evictPrefix(s"$p|")
    assert(!ModelCache.contains(s"$p|a") && !ModelCache.contains(s"$p|b"))
    assert(ModelCache.contains(s"other-$p"),
      "non-matching keys must survive a prefix eviction")
  }
}
