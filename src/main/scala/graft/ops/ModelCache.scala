package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.DataFrame

/** Driver-side memo of TRAINED model artifacts — k-means centroid
  * matrices, PQ codebooks, DSIR log-ratio models — keyed by (input
  * path, hyperparameters).
  *
  * Why this exists: every trained-model artifact in this engine is
  * deterministic in its inputs (seeded init, decimal-exact updates,
  * rounded arithmetic — the oracle replays each one bit-for-bit), so a
  * second training run over the same table at the same hyperparameters
  * is pure waste. The real workflow at 100 TB is train ONCE, evaluate /
  * serve MANY: an IVF index is built in one job and probed by millions
  * of queries; retraining per query would be absurd. This cache gives
  * the query layer that shape — the first query that needs a model
  * trains it (a bounded driver pull: k×dim centroids, m×k×subDim
  * codebooks, ≤dim-long DSIR models), and every later query in the same
  * JVM reuses the collected artifact.
  *
  * Correctness is unaffected BY CONSTRUCTION: the cached value is
  * exactly what the training call would return (determinism is already
  * a hard contract — it is what lets DuckDB replay the training chain),
  * so a cache hit and a retrain are indistinguishable to any consumer.
  * The key embeds the data directory, so sf0.001 / sf0.01 / sf0.1 runs
  * in one JVM never cross-contaminate.
  */
object ModelCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** applicationIds whose evict-on-stop listener is already registered.
    * Deliberately OUTSIDE `cache`: the registration is a fact about the
    * SparkContext's listener bus, not an evictable artifact — when the
    * bench's evict knob calls [[clear]], the listener stays on the bus,
    * so tracking it under an evictable key would re-register a duplicate
    * listener on every post-evict [[sessionCached]] call (r13 advice: a
    * slow listener leak over a long evicting bench run). One short
    * string per application ever started in the JVM — bounded.
    */
  private val listenerRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The artifact under `key`, training it with `train` on first use.
    * `train` may run Spark actions (all trainers here do) — which is
    * why this is NOT computeIfAbsent: holding a hash-bin lock across a
    * multi-second training job would block unrelated keys in the same
    * bin and deadlock (IllegalStateException) any trainer that itself
    * consults the cache. get-then-putIfAbsent admits a rare duplicate
    * train under a race, which determinism makes harmless: both racers
    * compute the identical artifact and either may win.
    */
  def cached[T <: AnyRef](key: String)(train: => T): T = {
    val hit = cache.get(key)
    if (hit ne null) return hit.asInstanceOf[T]
    val computed = train
    val prev = cache.putIfAbsent(key, computed)
    (if (prev ne null) prev else computed).asInstanceOf[T]
  }

  /** Entry count — observability for specs. */
  def size: Int = cache.size()

  /** Whether `key` is currently memoized — observability for specs. */
  def contains(key: String): Boolean = cache.containsKey(key)

  /** Drop everything (tests that mutate their input between runs, and
    * the bench's evict knob — driver memos are part of the cache
    * volume the knob bounds, not an exemption from it).
    */
  def clear(): Unit = cache.clear()

  /** Drop every entry whose key starts with `prefix`. */
  def evictPrefix(prefix: String): Unit =
    cache.keySet().removeIf(_.startsWith(prefix))

  /** Drop every [[sessionCached]] entry owned by `applicationId` — the
    * listener path, public so specs can drive the eviction directly
    * (stopping a second local SparkContext inside a shared-session test
    * JVM is not possible).
    */
  def evictSession(applicationId: String): Unit =
    evictPrefix(s"__session|$applicationId|")

  /** SESSION-SCOPED memo of materialized DataFrame artifacts (the
    * localCheckpoint'd kNN edge/arc sets, the cross-probe LSH index):
    * unlike the model artifacts above — plain driver values valid in
    * any session — a checkpointed DataFrame is BOUND to its
    * SparkContext, so these entries key by the context's
    * `applicationId` (stable and never reused within a JVM, where an
    * identity hash can be recycled after GC) and are EVICTED when the
    * context stops, so a later session is never handed a frame backed
    * by a stopped context and multi-session JVMs do not grow without
    * bound (r12 advice).
    */
  def sessionCached(s: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    sessionCachedRef(s, key)(build)

  /** [[sessionCached]] for an arbitrary session-bound artifact (e.g. a
    * case class bundling several checkpointed frames) — same key
    * scheme, same evict-on-stop listener.
    */
  def sessionCachedRef[T <: AnyRef](s: org.apache.spark.sql.SparkSession,
      key: String)(build: => T): T = {
    val appId = s.sparkContext.applicationId
    if (listenerRegistered.add(appId)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = evictSession(appId)
      })
    }
    cached(s"__session|$appId|$key")(build)
  }

  /** Whether `applicationId`'s evict-on-stop listener is registered —
    * observability for specs (the registration must survive [[clear]],
    * which is exactly what keeping it outside `cache` guarantees).
    */
  def listenerRegisteredFor(applicationId: String): Boolean =
    listenerRegistered.contains(applicationId)
}
