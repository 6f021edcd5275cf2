package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-order prefix aggregation.
  *
  * A global running sum (`Window.orderBy(...)` with no partition key) is
  * correct but funnels the whole relation through ONE reducer — the
  * classic 100 TB cliff. This operator computes the identical result with
  * no single-partition stage, via the textbook two-phase prefix sum:
  *
  *   1. bin rows into `nBins` ORDER-CONTIGUOUS ranges of `binCol`
  *      (boundaries from an approx-quantile sketch — one column-pruned
  *      pass; the bin assignment is a deterministic expression over the
  *      row's own value, so retries/replans can't reshuffle rows across
  *      bins);
  *   2. one partial sum per bin (tiny), exclusive-prefix-summed on a
  *      single partition of `nBins` rows;
  *   3. broadcast the bin offsets back and finish with a PER-BIN window —
  *      every window partition is ~1/nBins of the data.
  *
  * The result is independent of where the boundaries fall — uneven bins
  * only cost balance, never correctness. Requires `(binCol, tieCols)` to
  * be a total order (unique); `binCol` must be numeric (quantile sketch).
  */
object PrefixOps {

  /** `df` plus `outCol` = running sum of `valueCol` over the global order
    * `(binCol, tieCols…)`, inclusive of the current row. Exact for
    * long/decimal `valueCol` (associative addition; never float).
    */
  def globalCumsum(
      df: DataFrame,
      binCol: String,
      tieCols: Seq[String],
      valueCol: String,
      outCol: String,
      nBins: Int = 32
  ): DataFrame = {
    val valueType = df.schema(valueCol).dataType
    val zero = lit(0).cast(valueType)
    // distinct: repeated quantiles (skewed binCol) would make duplicate
    // when-branches — harmless but wasteful codegen. nBins=1 degenerates
    // to zero boundaries (one bin — approxQuantile NPEs on an empty
    // probability array, so don't ask it).
    val bounds =
      if (nBins <= 1) Array.empty[Double]
      else df.stat
        .approxQuantile(binCol, (1 until nBins).map(_.toDouble / nBins).toArray, 0.01)
        .distinct
    val binExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(binCol) > lit(b), 1).otherwise(0)
    }
    val binned = df.withColumn("__bin", binExpr)
    val offsets = binned
      .groupBy("__bin")
      .agg(sum(col(valueCol)).as("__bin_sum"))
      // nBins rows: the single-partition window here is over the BIN
      // SUMMARY, not the data — the whole point of the two-phase shape
      .withColumn("__offset",
        coalesce(
          sum(col("__bin_sum")).over(
            Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)),
          zero))
      .select(col("__bin"), col("__offset"))
    val perBin = Window
      .partitionBy("__bin")
      .orderBy(col(binCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    binned
      .join(broadcast(offsets), Seq("__bin"))
      .withColumn(outCol, col("__offset") + sum(col(valueCol)).over(perBin))
      .drop("__bin", "__offset")
  }

  /** Global dense row position (1-based) over `(binCol, tieCols…)` — a
    * distributed `row_number() OVER (ORDER BY …)`: cumsum of ones.
    */
  def globalRowNumber(
      df: DataFrame,
      binCol: String,
      tieCols: Seq[String],
      outCol: String,
      nBins: Int = 32
  ): DataFrame =
    globalCumsum(
      df.withColumn("__one", lit(1L)), binCol, tieCols, "__one", outCol, nBins)
      .drop("__one")
}
