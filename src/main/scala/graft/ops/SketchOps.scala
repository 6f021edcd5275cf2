package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    graft.expressions.Md5PrefixLong.draw(
      concat(lit(s"$r:"), key.cast("string")), 8) % width

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

  // ===== HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, AofA 2007) ===

  /** Register-index bits: m = 2^6 = 64 registers per group. */
  val HllP = 6
  val HllM = 64
  /** Remainder bits of the 32-bit draw (32 − HllP). */
  val HllW = 26
  /** Rank when the remainder is all zeros: every one of its HllW bits
    * leads with a zero, plus one — the HLL ρ convention.
    */
  val HllRankCap = HllW + 1
  /** α₆₄·m²·2^HllRankCap·10⁶ with α₆₄ = 709/1000 (the published
    * constant for m = 64): the whole micro-estimate numerator folded
    * into ONE exact long (z is rescaled by 2^HllRankCap below), so
    * `est_micro = HllEstNumerator div z` is pure 64-bit integer
    * arithmetic — bit-identical on any engine.
    */
  val HllEstNumerator: Long = 709L * HllM * HllM * (1L << HllRankCap) * 1000L

  /** The uniform 32-bit draw for a key — the [[cmsBucket]] /
    * SampleOps.hashDraw md5 convention, 8 hex chars wide.
    */
  def hllDraw(key: Column): Column =
    graft.expressions.Md5PrefixLong.draw(key.cast("string"), 8)

  /** Register index: the draw's top HllP bits. */
  def hllIdx(h: Column): Column = shiftright(h, HllW)

  /** Register rank ρ: leading zeros of the HllW-bit remainder plus one,
    * computed EXACTLY from the remainder's binary-string length — both
    * engines' `bin()` render a positive integer without leading zeros,
    * so ρ = HllW + 1 − len(bin(w)), capped at HllW + 1 when w = 0. No
    * floating log anywhere.
    */
  def hllRank(h: Column): Column = {
    val w = h.bitwiseAND(lit((1L << HllW) - 1))
    when(w === 0, lit(HllRankCap))
      .otherwise(lit(HllRankCap) - length(bin(w)))
      .cast("long")
  }

  /** The HLL register table for `key` per group: (group…, idx,
    * max_rank), at most [[HllM]] rows per group. `max` is algebraic, so
    * partial aggregation combines map-side and the shuffle carries at
    * most m rows per (group, partition) REGARDLESS of data volume — the
    * registers ARE the mergeable sketch state (two registers tables for
    * disjoint slices merge by the same groupBy/max), which is what makes
    * this the 100 TB distinct-count shape: the corpus is scanned once
    * and only fixed-size summaries move. NULL keys are not sketched
    * (a null never hashes), matching [[cmsTable]].
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val h = hllDraw(key)
    df.filter(key.isNotNull)
      .select(groupCols.map(col) ++ Seq(hllIdx(h).as("idx"), hllRank(h).as("rank")): _*)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(max("rank").as("max_rank"))
  }

  /** The raw HLL estimate from a registers table, in exact integer
    * micro-units: est_micro = [[HllEstNumerator]] div z where
    * z = Σ_filled 2^(cap − M[j]) + (m − filled)·2^cap is the harmonic
    * denominator rescaled by 2^cap into a long. Pure integer floor
    * division — deterministic and engine-independent (no doubles, no
    * small/large-range corrections: this is the raw estimator, which is
    * the right regime for the ≥ m·5/2 cardinalities the sketch is for).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_registers"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRankCap - max_rank)"))
          .as("z_filled"))
      .withColumn("z",
        col("z_filled") + (lit(HllM) - col("n_registers")) * lit(1L << HllRankCap))
      .withColumn("est_micro", expr(s"$HllEstNumerator div z"))
      .drop("z_filled", "z")

  // ===== KMV set algebra (Beyer, Haas, Reinwald, Sismanis, Gemulla,
  // SIGMOD 2007): distinct / union / intersection / Jaccard estimates
  // from two k-minimum-values synopses =====

  /** Set-operation estimates for two value sets from their k-min
    * synopses, next to the exact answers (one row):
    *
    *   - est_a / est_b: (k−1)/u_k per set;
    *   - est_union: the same estimator over the k smallest of the
    *     COMBINED synopsis — valid because the k smallest hashes of
    *     A∪B are a subset of the union of the two k-min lists;
    *   - rho: |L ∩ K_A ∩ K_B| for L = the union synopsis —
    *     the Jaccard estimator ρ/k (est_jaccard_ppm, integer ppm);
    *   - est_inter: ρ·est_union div k (inclusion via the Jaccard
    *     route, the paper's unbiased composition).
    *
    * ONE derivation end-to-end (r15): digest-keyed membership flags in
    * one corpus shuffle, each digest exploded into its synopsis
    * categories (a / b / union), ONE ranked window, then a single
    * k-bounded aggregation to the result row — max(rank) IS each
    * category's exact distinct count (so exact_inter falls out by
    * inclusion–exclusion from |A∪B|), the k-th smallest digest is
    * max(d) under rank ≤ k, and the ≤k-element k-min digest LISTS
    * feed ρ via array intersection. The old plan re-derived the
    * corpus-sized distinct in SEVEN branches (estA/estB/estU/rho/
    * exA/exB/exI) and crossJoined the scalars — a fixed multi-job
    * floor, the a19 lesson on the sketch axis. At 100 TB the bounded
    * alternative remains the [[graft.expressions.KmvDistinct]]
    * TypedImperativeAggregate (a8), whose buffer carries only k
    * digests per partition; this composable form exists because the
    * set ALGEBRA needs the synopsis rows themselves, and the exact
    * companion columns need the full distinct anyway.
    *
    * Both inputs must have a single column `v`; groups with fewer than
    * k distinct values are the caller's contract to avoid (they are
    * exactly countable — the estimator's own paper's advice).
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "kmvSetOps requires k >= 2")
    val tagged = a.select(lit("a").as("s"), col("v"))
      .unionAll(b.select(lit("b").as("s"), col("v")))
      .filter(col("v").isNotNull)
    val flags = tagged
      .select(md5(col("v").cast("string")).as("d"), col("s"))
      .groupBy("d")
      .agg(max(when(col("s") === "a", 1).otherwise(0)).as("in_a"),
        max(when(col("s") === "b", 1).otherwise(0)).as("in_b"))
    // each distinct digest lands in its member categories plus the
    // union category — the three synopses rank in one window pass
    val cats = flags.select(col("d"), explode(array(
      when(col("in_a") === 1, "a"),
      when(col("in_b") === 1, "b"),
      lit("u"))).as("cat"))
      .filter(col("cat").isNotNull)
    val w = Window.partitionBy("cat").orderBy("d")
    val ranked = cats.withColumn("r", row_number().over(w))
    // bounded: each k-min list collects only rows with rank ≤ k —
    // ≤ k digests per category (collect_list skips the non-matching
    // rows' nulls), independent of corpus size or key skew.
    def kminList(cat: String) = sort_array(collect_list(
      when(col("cat") === cat && col("r") <= k, col("d"))))
    def kthDigest(cat: String) = max(
      when(col("cat") === cat && col("r") <= k, col("d")))
    def exactOf(cat: String) = max(when(col("cat") === cat, col("r")))
      .cast("long")
    val one = ranked.agg(
      exactOf("a").as("exact_a"), exactOf("b").as("exact_b"),
      exactOf("u").as("exact_union"),
      kthDigest("a").as("ua"), kthDigest("b").as("ub"),
      kthDigest("u").as("uu"),
      kminList("a").as("ka"), kminList("b").as("kb"),
      kminList("u").as("ku"))
      // empty input → the no-groupBy agg's single all-null row → zero
      // rows, matching the old empty-branch crossJoin behavior
      .filter(col("exact_a").isNotNull && col("exact_b").isNotNull)
    val c = (k - 1).toLong * 4294967296L
    one
      .withColumn("u32a", conv(substring(col("ua"), 1, 8), 16, 10).cast("long"))
      .withColumn("u32b", conv(substring(col("ub"), 1, 8), 16, 10).cast("long"))
      .withColumn("u32u", conv(substring(col("uu"), 1, 8), 16, 10).cast("long"))
      .withColumn("est_a", expr(s"$c div u32a"))
      .withColumn("est_b", expr(s"$c div u32b"))
      .withColumn("est_union", expr(s"$c div u32u"))
      .withColumn("rho", size(array_intersect(
        array_intersect(col("ku"), col("ka")), col("kb"))).cast("long"))
      .withColumn("exact_inter",
        col("exact_a") + col("exact_b") - col("exact_union"))
      .select(
        lit(k.toLong).as("k"),
        col("est_a"), col("exact_a"),
        col("est_b"), col("exact_b"),
        col("est_union"),
        col("exact_union"),
        col("rho"),
        expr(s"rho * 1000000 div $k").as("est_jaccard_ppm"),
        expr("exact_inter * 1000000 div (exact_a + exact_b - exact_inter)")
          .as("exact_jaccard_ppm"),
        expr(s"rho * est_union div $k").as("est_inter"),
        col("exact_inter"))
  }
}
