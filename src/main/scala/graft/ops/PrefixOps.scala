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

  /** EXACT global k-th order statistic (default: the lower median) with
    * no global sort — the selection companion to [[globalCumsum]]'s
    * prefix sums. An exact median on 100 TB cannot `ORDER BY` the
    * relation (one reducer) and `approx_percentile` is an estimate;
    * the textbook two-phase selection is exact at any scale:
    *
    *   1. one pass: (count, min, max);
    *   2. one pass: a fixed-width `nBins` histogram (map-side combined
    *      — the shuffle carries nBins partials per partition);
    *   3. locate the bin holding rank k from the bounded histogram
    *      (driver-side over nBins rows — a summary, never data);
    *   4. one pruned pass: sort ONLY that bin (~1/nBins of the data)
    *      and take its `k − cumBelow`-th row.
    *
    * The answer is the k-th VALUE of the sorted multiset — independent
    * of where bin boundaries fall, so the oracle replays it with a
    * plain ORDER BY / OFFSET. Nulls excluded; `k` defaults to
    * `(n−1)/2`. Returns one row (n, k, kth) — or zero rows on empty
    * input.
    */
  def exactKth(
      df: DataFrame,
      valueCol: String,
      k: Long => Long = n => (n - 1) / 2,
      nBins: Int = 1024
  ): DataFrame = {
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val st = vals.agg(count(lit(1)), min("v"), max("v")).head()
    val n = st.getLong(0)
    if (n == 0)
      return vals.limit(0)
        .select(lit(0L).as("n"), lit(0L).as("k"), col("v").as("kth"))
    val kk = k(n)
    require(kk >= 0 && kk < n, s"rank $kk out of [0, $n)")
    val (mn, mx) = (st.getDouble(1), st.getDouble(2))
    if (mn == mx)
      return vals.limit(1)
        .select(lit(n).as("n"), lit(kk).as("k"), col("v").as("kth"))
    val width = (mx - mn) / nBins
    val binExpr = least(lit(nBins - 1),
      floor((col("v") - lit(mn)) / lit(width))).cast("int")
    val hist = vals.groupBy(binExpr.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cumBelow = 0L
    var target = -1
    var i = 0
    while (target < 0 && i < nBins) {
      val c = hist.getOrElse(i, 0L)
      if (kk < cumBelow + c) target = i else { cumBelow += c; i += 1 }
    }
    val offset = kk - cumBelow
    require(offset <= Int.MaxValue,
      s"bin $target holds > 2^31 rows at rank offset $offset — raise nBins")
    vals.filter(binExpr === target)
      .orderBy(col("v"))
      .offset(offset.toInt).limit(1)
      .select(lit(n).as("n"), lit(kk).as("k"), col("v").as("kth"))
  }
}
