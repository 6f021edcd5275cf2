package graft.ops

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

  /** Drop everything (tests that mutate their input between runs). */
  def clear(): Unit = cache.clear()
}
