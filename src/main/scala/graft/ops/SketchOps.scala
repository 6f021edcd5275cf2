package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency estimation over unbounded key
  * cardinality — the 100 TB answer to "how often does each of these
  * tokens/domains/hosts occur" when the key space is too large to count
  * exactly. The sketch is a d×w counter matrix; every update touches one
  * bucket per row, estimates take the min across rows, and two sketches
  * MERGE by cell-wise addition — so per-partition sketches combine
  * map-side and the full build is ONE shuffle of at most d×w rows per
  * partition, independent of data volume.
  *
  * Hash rows are md5-derived with fixed per-row salts (the
  * [[TextOps.hashBucket]] / [[SampleOps.hashDraw]] convention), which
  * makes the whole sketch DETERMINISTIC: the same input yields the same
  * matrix on any engine, any partitioning, any run — estimates
  * hash-compare exactly against an oracle replay (most sketch libraries
  * seed per-run and can only be bounds-checked; see `a5`'s rated-error
  * pattern for that case). The one-sided guarantee `estimate ≥ true`
  * holds by construction; overestimates are bounded by colliding mass.
  */
object SketchOps {

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Row `r`'s bucket for `key`: the first 8 md5 hex chars of the salted
    * key as a uniform 32-bit draw, reduced mod the width.
    */
  def cmsBucket(key: Column, r: Int, width: Int = CmsWidth): Column =
    conv(substring(md5(concat(lit(s"$r:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch: one scan-side explode onto the d rows, one
    * aggregation shuffle. Output (r, b, c) — at most d×w rows total.
    * NULL keys are NOT sketched (a null never hashes to a bucket);
    * [[cmsHeavyHitters]] carries them through its exact re-count
    * explicitly, and [[cmsEstimate]] reports 0 for them like any
    * never-sketched key.
    */
  def cmsTable(df: DataFrame, key: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    df.filter(col(key).isNotNull)
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(key), r, width).as("b"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Heavy hitters WITHOUT a full-cardinality shuffle: build the sketch
    * (one bounded shuffle), collect the d×w matrix to the driver (bounded
    * by construction — the kmeans-centroid pattern), probe it SCAN-SIDE
    * through a broadcast map literal, and exact-count only the rows whose
    * estimate clears the threshold. `estimate ≥ true` means NO false
    * negatives, so after the exact re-count filters the sketch's false
    * positives the result PROVABLY equals the naive
    * `GROUP BY key HAVING count ≥ t` — which is what the oracle runs. At
    * 100 TB the naive form shuffles every distinct key; this form
    * shuffles d×w counters plus only the candidate rows.
    */
  def cmsHeavyHitters(df: DataFrame, key: String, threshold: Long,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    val rows = cmsTable(df, key, depth, width).collect()
    if (rows.isEmpty) {
      import df.sparkSession.implicits._
      return Seq.empty[(String, Long)].toDF(key, "true_count")
        .select(col(key).cast(df.schema(key).dataType), col("true_count"))
    }
    // flat array literal indexed by r·width+b: element_at on an ARRAY is
    // O(1), while a map literal's lookup scans its entries — measured
    // ~4× whole-query difference at d×w = 4096
    val flat = new Array[Long](depth * width)
    rows.foreach(r => flat(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    val m = typedlit(flat.toSeq)
    val estimate = (0 until depth).map(r =>
      element_at(m,
        (lit(r * width + 1) + cmsBucket(col(key), r, width)).cast("int")))
      .reduce(least(_, _))
    // NULL keys never hash (concat-with-null nulls the bucket, so their
    // estimate is null and `>=` would silently drop them) — keep them
    // through the candidate filter unconditionally; the exact re-count
    // below decides their fate, preserving equality with the naive
    // GROUP BY ... HAVING form, whose NULL group is a real group.
    df.filter(estimate >= threshold || col(key).isNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("true_count"))
      .filter(col("true_count") >= threshold)
  }

  /** Point estimates for `keys` (one column named `key`): min over the
    * d row counters each key hashes into. The sketch side is d×w rows —
    * broadcast it; the key side can be any size. The sketch table only
    * materializes touched (r, b) cells, so an unpopulated cell means a
    * true counter of 0 — LEFT join + coalesce, or a never-seen key
    * would lose that cell from its min (overestimating vs the true CMS
    * min of 0) or vanish entirely when all d cells are empty.
    */
  def cmsEstimate(keys: DataFrame, cms: DataFrame, key: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    keys
      .select(col(key), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(key), r, width).as("b"))): _*))
        .as("rb"))
      .select(col(key), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
}
