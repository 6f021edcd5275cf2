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
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

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
}
