package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (Börzsönyi, Kossmann, Stocker, ICDE
  * 2001): the rows not DOMINATED by any other row, where `o` dominates
  * `r` iff o is ≥ r on the maximized column and ≤ r on the minimized
  * column, strictly better on at least one. The classic "best
  * price-for-size" / "best quality-for-cost" frontier query.
  *
  * The textbook sequential algorithm (sort by max-col desc, sweep a
  * running min of the min-col) needs a GLOBAL sort — one reducer at
  * 100 TB. This is the two-phase grid shape instead (the w6/exactKth
  * pattern):
  *
  *   1. one pass: value range of the max-col (a 2-double driver pull —
  *      the approxQuantile class of bounded action — so the bin
  *      expression is a plan literal, never a replanned 1-row agg);
  *   2. fixed-width bins on the max-col; per-bin min of the min-col —
  *      a bounded aggregation (≤ nBins rows), whose EXCLUSIVE prefix
  *      min over strictly-higher bins is the only single-partition
  *      window (over the bin SUMMARY, never the data);
  *   3. grid prune: a row beaten by a strictly-higher bin's min is
  *      dominated (bin boundaries are price-strict by construction:
  *      equal max-col values always share a bin);
  *   4. exact within-bin resolution, partitioned BY BIN (distributed):
  *      per (bin, value) group mins, exclusive running min over higher
  *      same-bin values — the window runs over the group SUMMARY of
  *      each bin, and both predicates apply in one final filter.
  *
  * Domination semantics at ties: duplicate (max, min) points do NOT
  * dominate each other — all copies surface (matching the strict
  * NOT EXISTS definition the oracle runs). Null measures are excluded
  * (domination is undefined on null).
  */
object SkylineOps {

  def skyline2(
      df: DataFrame,
      maxCol: String,
      minCol: String,
      nBins: Int = 32): DataFrame = {
    val x = col(maxCol).cast("double")
    val in = df.filter(col(maxCol).isNotNull && col(minCol).isNotNull)
    // bounded driver pull (2 doubles — the globalCumsum/approxQuantile
    // class of action): bin boundaries as plan literals keep the 1-row
    // stats aggregate from being replanned into every branch below
    val statsRow = in.agg(min(x), max(x)).collect().head
    if (statsRow.isNullAt(0)) return in
    val (lo, hi) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val binExpr =
      if (hi == lo) lit(0L)
      else least(floor((x - lit(lo)) / lit((hi - lo) / nBins)),
        lit((nBins - 1).toLong))
    val binned = in.withColumn("__bin", binExpr)
    val wBins = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prune = binned.groupBy("__bin").agg(min(col(minCol)).as("__bm"))
      .withColumn("__pm", min(col("__bm")).over(wBins))
      .select("__bin", "__pm")
    val wIn = Window.partitionBy("__b2").orderBy(col("__x2").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grp = binned.groupBy(col("__bin").as("__b2"), x.as("__x2"))
      .agg(min(col(minCol)).as("__gm"))
      .withColumn("__cm", min(col("__gm")).over(wIn))
    binned
      .join(broadcast(prune), Seq("__bin"))
      .join(grp, col("__bin") === col("__b2") && x === col("__x2"))
      .filter((col("__pm").isNull || col(minCol) < col("__pm")) &&
        (col("__cm").isNull || col(minCol) < col("__cm")) &&
        col(minCol) === col("__gm"))
      .drop("__bin", "__b2", "__x2", "__pm", "__gm", "__cm")
  }
}
