package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for reproducible pipelines.
  *
  * `df.sample(seed)` is partition-dependent in Spark: the same seed draws
  * different rows after a repartition, an AQE re-plan, or a cluster
  * resize — useless as a 100 TB corpus-subsetting contract. These
  * operators instead derive the draw from a HASH OF THE ROW KEY: the
  * same row is kept or dropped on every run, every engine, and any
  * partitioning, and membership is stable under incremental reprocessing
  * (yesterday's sample is a subset of today's at the same fraction).
  * Scan-side filter, zero shuffle, codegen-friendly.
  */
object SampleOps {

  /** Draw space: the first 4 hex chars of md5(key) as a uniform 16-bit
    * integer. 65536 cells give 0.0015% fraction granularity — ample for
    * corpus sampling; widen the slice for finer control.
    */
  val HashSpace = 65536L

  /** Uniform draw in [0, HashSpace) from the row key. */
  def hashDraw(key: Column): Column =
    graft.expressions.Md5PrefixLong.draw(key.cast("string"), 4)

  /** Deterministic 3-way split label for a key: the [[hashDraw]] draw
    * against cumulative fraction thresholds. A pure scan-side expression
    * — any query needing a row's split derives it from the key alone,
    * never by joining a split table.
    */
  def splitOf(key: Column, trainFrac: Double = 0.8, valFrac: Double = 0.1): Column =
    when(hashDraw(key) < (trainFrac * HashSpace).toLong, lit("train"))
      .when(hashDraw(key) < ((trainFrac + valFrac) * HashSpace).toLong, lit("val"))
      .otherwise(lit("test"))

  /** Keep ~`fraction` of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: String, fraction: Double): DataFrame =
    df.filter(hashDraw(col(key)) < (fraction * HashSpace).toLong)

  /** Importance sampling: keep each row with ITS OWN probability
    * `weightCol` (a [0,1] column — e.g. a quality score), still
    * deterministic by key. The pretraining-mixture move of keeping
    * high-quality documents preferentially without a global sort or any
    * RNG state; same scan-side zero-shuffle shape as [[hashSample]].
    * floor-before-cast keeps Spark (truncating) and DuckDB (rounding)
    * double→long casts in agreement.
    */
  def weightedHashSample(df: DataFrame, key: String, weightCol: Column): DataFrame =
    df.filter(hashDraw(col(key)) <
      floor(least(lit(1.0), greatest(lit(0.0), weightCol)) * HashSpace).cast("long"))

  /** Per-stratum fractions (e.g. downsample dominant languages, keep all
    * of rare ones); strata missing from the map are dropped entirely.
    */
  def stratifiedHashSample(
      df: DataFrame,
      key: String,
      strata: String,
      fractions: Map[String, Double]
  ): DataFrame = {
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (s, f)) =>
      when(col(strata) === s, lit((f * HashSpace).toLong)).otherwise(acc)
    }
    df.filter(hashDraw(col(key)) < threshold)
  }

  /** Neyman optimal allocation (Neyman 1934): per-stratum sampling
    * rates ∝ N_h·σ_h — high-variance strata get oversampled, constant
    * strata barely sampled — the minimum-variance design for a fixed
    * total budget, then the deterministic hash draw executes it in the
    * same pass. [[stratifiedSample]] takes the rates as GIVEN; this
    * derives them from the data (one exact-decimal moment pass), which
    * is what a real survey/eval-set budget run needs.
    *
    * Numeric contract: per-stratum moments are exact DECIMAL sums; σ_h
    * and the allocated fraction evaluate in one fixed double order;
    * the integer draw threshold floor(min(1, f_h)·65536) is what
    * actually selects rows, so the SAMPLE ITSELF is deterministic.
    * Single-row strata carry σ = 0 (no variance to chase — they get
    * no budget beyond the σ > 0 strata's leftovers, i.e. none).
    *
    * Returns per stratum: (stratum, n_rows, sigma_micro, thr,
    * n_sampled).
    */
  def neymanAllocate(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      valueCol: String,
      budgetFrac: Double): DataFrame = {
    val v = round(col(valueCol), 6).cast("decimal(18,6)")
    val stats = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(v).as("s1"),
        sum(v * v).as("s2"))
      .withColumn("sigma",
        when(col("n_rows") < 2, lit(0.0))
          .otherwise(sqrt(
            (col("n_rows") * col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
              (col("n_rows") * (col("n_rows") - 1)))))
    // per-stratum weights land as micro LONGS before the total — a
    // float Σ N_h·σ_h would be partition-order-dependent
    val weighted = stats.withColumn("w_micro",
      round(col("n_rows").cast("double") * col("sigma") * lit(1000000.0))
        .cast("long"))
    val tot = weighted.agg(
      sum(col("n_rows")).as("n_total"),
      sum(col("w_micro")).as("w_total_micro"))
    val withThr = weighted.crossJoin(broadcast(tot))
      .withColumn("f",
        when(col("w_total_micro") > 0,
          least(lit(1.0),
            round(col("n_total") * lit(budgetFrac)) * col("sigma") *
              lit(1000000.0) / col("w_total_micro")))
          .otherwise(lit(0.0)))
      .withColumn("thr", floor(col("f") * lit(HashSpace.toDouble)).cast("long"))
      .select(col("stratum"), col("n_rows"),
        round(col("sigma") * lit(1000000.0)).cast("long").as("sigma_micro"),
        col("thr"))
    df.select(col(stratumCol).as("stratum"), hashDraw(col(keyCol)).as("u"))
      .join(broadcast(withThr), Seq("stratum"))
      .groupBy("stratum", "n_rows", "sigma_micro", "thr")
      .agg(sum(when(col("u") < col("thr"), 1L).otherwise(0L)).as("n_sampled"))
  }

  /** Weighted reservoir sample of exactly k rows per stratum
    * (Efraimidis-Spirakis 2006, A-ES): each row draws score
    * ln(u)/w — monotone in the paper's u^(1/w) key — and the top-k
    * scores per stratum ARE the sample, with inclusion probability ∝
    * weight. Deterministic like everything in this file: u derives from
    * the row-key hash ((2h+1)/2·HashSpace — never exactly 0 or 1), so
    * the same rows are drawn on every run, engine, and partitioning.
    *
    * Shape: one scan computes the score, one per-stratum top-k window
    * (WindowGroupLimit prunes to k rows per partition before the final
    * sort — no stratum's full population is ever sorted); rows with
    * non-positive weight are excluded by contract. Score evaluates in
    * one fixed double order, surfaced in e-9 units. Returns
    * (stratum, key, weight, score_e9, rk), rk 1..k.
    */
  def weightedReservoir(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      weightCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hashDraw(col(keyCol)) * 2 + 1).cast("double") /
      lit((2 * HashSpace).toDouble)
    val scored = df
      .filter(weightCol > 0)
      .select(col(stratumCol).as("stratum"), col(keyCol).as("key"),
        weightCol.cast("double").as("weight"),
        (log(u) / weightCol.cast("double")).as("score"))
    val w = Window.partitionBy("stratum")
      .orderBy(col("score").desc, col("key"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("stratum"), col("key"), col("weight"),
        round(col("score") * lit(1000000000.0)).cast("long").as("score_e9"),
        col("rk").cast("long").as("rk"))
  }
}
