package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023): score every raw
  * document by how much its hashed-n-gram profile looks like a TARGET
  * distribution, then resample proportionally to the importance weight.
  *
  * The public recipe, re-expressed in Spark's execution model:
  *
  *  1. FEATURES — each doc becomes a multiset of hashed n-gram buckets
  *     (unigrams + bigrams through [[TextOps.hashBucket]], md5-prefix
  *     mod `dim`). Pure scan-side `transform`, no shuffle, and the same
  *     integer math any engine can replay (the DuckDB oracle does).
  *  2. FIT — ONE pass over the exploded features computes BOTH bag-of-
  *     hashed-ngrams unigram models (raw corpus and target subset) as a
  *     conditional aggregate: `dim` result rows, map-side combined. The
  *     collected model is ≤ dim longs — the same bounded driver pull the
  *     CMS sketch and k-means centroids make; the corpus itself never
  *     moves.
  *  3. SCORE — the per-bucket smoothed log-ratio model travels back as
  *     ONE array literal (`typedlit`, a single constant in codegen — no
  *     per-element expression tree), and each doc's importance weight is
  *     `aggregate` over its own feature array. Zero shuffle; at 100 TB
  *     this is a map over the corpus scan.
  *  4. SELECT — Gumbel-top-k: sampling k docs without replacement with
  *     probability ∝ exp(weight) ≡ taking the top k of
  *     `weight + Gumbel(0,1)`. The uniform behind the Gumbel is the
  *     [[SampleOps.hashDraw]] md5 draw, so selection is deterministic on
  *     any partitioning and replayable by the oracle. Top-k compiles to
  *     TakeOrderedAndProject — per-partition heaps, only k rows shuffle.
  *
  * Numeric contract: per-bucket log-ratios are rounded to 6 decimals and
  * held in exact MICRO units (`round(ln·,6) · 1e6` as BIGINT), so the
  * per-doc sum is integer math — associative, partitioning-independent,
  * and hash-identical to the oracle's replay (the `round(·,6)` +
  * DECIMAL pattern `text_lm_score` established for ln parity).
  */
object DsirOps {

  /** Model dimensionality: hashed feature buckets. Collisions are part
    * of the method (hashing trick); 1024 keeps the collected model tiny
    * while leaving bucket counts well-populated at bench scale.
    */
  val DefaultDim = 1024

  /** Add-`alpha` smoothing for both models (unseen buckets get mass). */
  val Alpha = 1.0

  /** A doc's hashed feature multiset: unigram + bigram buckets. */
  def featureBuckets(toks: Column, dim: Int = DefaultDim): Column =
    concat(
      transform(toks, t => TextOps.hashBucket(t, dim)),
      transform(TextOps.shingles(toks, 2), g => TextOps.hashBucket(g, dim)))

  /** Both unigram models in ONE corpus scan: (bucket, raw_n, tgt_n),
    * ≤ `dim` rows, map-side combined.
    */
  def fitCounts(docs: DataFrame, feats: Column, isTarget: Column): DataFrame =
    docs
      .select(explode(feats).as("bucket"), isTarget.as("__t"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("raw_n"),
        sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("tgt_n"))

  /** The dense log-ratio model in micro units:
    * `model(b) = round(ln((tgt_b+α)/(T+α·dim)) − ln((raw_b+α)/(R+α·dim)), 6) · 1e6`.
    *
    * The rounding and ln run INSIDE Spark expressions (engine parity
    * with the oracle's `ln`/`round`), and the decimal→micro conversion
    * is exact (`DECIMAL(28,6) · 1e6 → BIGINT`). Only `dim` longs cross
    * to the driver. Buckets absent from the counts get the zero-count
    * ratio — the same formula the oracle's `range(dim) LEFT JOIN`
    * evaluates.
    */
  def logRatioMicro(
      spark: SparkSession,
      counts: DataFrame,
      dim: Int = DefaultDim,
      alpha: Double = Alpha): Array[Long] = {
    // The fitted counts (≤ dim rows) are read twice below — totals, then
    // the densify join — and refit verbatim by every query that shares
    // the model (weights, select). cache() makes the corpus-scanning
    // explode+aggregate run ONCE per model: CacheManager keys on the
    // canonicalized plan, so independent rebuilds of the same fit hit it
    // (the dedupBands precedent). Memory cost is ≤ dim short rows.
    val c = counts.cache()
    val tot = c
      .agg(sum("raw_n").cast("long").as("r"), sum("tgt_n").cast("long").as("t"))
      .head()
    val (rTot, tTot) = (tot.getLong(0), tot.getLong(1))

    def micro(rawN: Column, tgtN: Column): Column =
      (round(
        log((tgtN.cast("double") + alpha) / (tTot + alpha * dim)) -
          log((rawN.cast("double") + alpha) / (rTot + alpha * dim)),
        6).cast("decimal(28,6)") * lit(1000000L)).cast("long")

    // Densify with a dim-row range so absent buckets run through the
    // SAME Spark round(ln·) expression as present ones — no driver-side
    // Math.log whose tie-rounding could drift from the engines'.
    val model = spark
      .range(dim.toLong)
      .join(c.withColumnRenamed("bucket", "id"), Seq("id"), "left")
      .select(
        col("id"),
        micro(coalesce(col("raw_n"), lit(0L)), coalesce(col("tgt_n"), lit(0L)))
          .as("micro"))
      .collect()
    val arr = new Array[Long](dim)
    model.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Per-doc importance log-weight in micro units: integer `aggregate`
    * over the doc's own feature array against the one-literal model.
    * Scan-side, zero shuffle.
    */
  def scoreMicro(feats: Column, model: Array[Long]): Column = {
    val m = typedlit(model.toSeq)
    aggregate(
      feats,
      lit(0L),
      (acc, f) => acc + element_at(m, f.cast("int") + 1))
  }

  /** The Gumbel perturbation for top-k resampling ∝ exp(weight):
    * `−ln(−ln(u))` with `u = (hashDraw(key)+0.5)/HashSpace` — a
    * deterministic uniform in (0,1), so the draw replays identically on
    * any engine. Rounded to 6 decimals like every float the oracle
    * hash-checks.
    */
  def gumbelKey(microWeight: Column, key: Column): Column = {
    val u = (SampleOps.hashDraw(key).cast("double") + 0.5) / SampleOps.HashSpace
    round(microWeight.cast("double") / 1000000.0 - log(-log(u)), 6)
  }

  /** End-to-end selection: fit on `docs`, score every doc, keep the
    * Gumbel-top-`k`. Two corpus scans (fit, score+select), zero corpus
    * shuffles; the model is the only data that moves.
    */
  def select(
      spark: SparkSession,
      docs: DataFrame,
      toks: Column,
      keyCol: String,
      isTarget: Column,
      k: Int,
      dim: Int = DefaultDim): DataFrame =
    select(docs, toks, keyCol,
      logRatioMicro(spark, fitCounts(docs, featureBuckets(toks, dim), isTarget), dim),
      k, dim)

  /** Selection against an ALREADY-FIT model — the train-once split (one
    * fitted log-ratio model serves weights, selection, and any future
    * mixture pass over the same corpus).
    */
  def select(
      docs: DataFrame,
      toks: Column,
      keyCol: String,
      model: Array[Long],
      k: Int,
      dim: Int): DataFrame = {
    val feats = featureBuckets(toks, dim)
    docs
      .select(
        col(keyCol),
        scoreMicro(feats, model).as("dsir_micro"))
      .withColumn("dsir_key", gumbelKey(col("dsir_micro"), col(keyCol)))
      .orderBy(col("dsir_key").desc, col(keyCol).asc)
      .limit(k)
  }
}
