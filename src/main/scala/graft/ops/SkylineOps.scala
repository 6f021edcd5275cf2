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
  *   1. one pass: value range of the max-col (1-row broadcast);
  *   2. fixed-width bins on the max-col; per-bin min of the min-col —
  *      a bounded aggregation (≤ nBins rows), whose EXCLUSIVE prefix
  *      min over strictly-higher bins is the only single-partition
  *      window (over the bin SUMMARY, never the data);
  *   3. grid prune: a row beaten by a strictly-higher bin's min is
  *      dominated (bin boundaries are price-strict by construction:
  *      equal max-col values always share a bin). Survivors hug the
  *      frontier — a tiny fraction of the data;
  *   4. exact within-bin resolution among survivors only, partitioned
  *      BY BIN (distributed): per (bin, value) group mins, exclusive
  *      running min over higher same-bin values. In-bin dominators of
  *      a survivor are themselves survivors (their min-col is ≤ the
  *      survivor's, so they pass the same prune), so resolving among
  *      survivors loses nothing.
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
    val stats = in.agg(min(x).as("__lo"), max(x).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    val binned = in.crossJoin(broadcast(stats))
      .withColumn("__bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(floor((x - col("__lo")) / width), lit((nBins - 1).toLong))))
      .drop("__lo", "__hi")
    val wBins = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prune = binned.groupBy("__bin").agg(min(col(minCol)).as("__bm"))
      .withColumn("__pm", min(col("__bm")).over(wBins))
      .select("__bin", "__pm")
    val surv = binned.join(broadcast(prune), Seq("__bin"))
      .filter(col("__pm").isNull || col(minCol) < col("__pm"))
      .drop("__pm")
    val wIn = Window.partitionBy("__b2").orderBy(col("__x2").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grp = surv.groupBy(col("__bin").as("__b2"), x.as("__x2"))
      .agg(min(col(minCol)).as("__gm"))
      .withColumn("__cm", min(col("__gm")).over(wIn))
    surv
      .join(grp, col("__bin") === col("__b2") && x === col("__x2"))
      .filter((col("__cm").isNull || col(minCol) < col("__cm")) &&
        col(minCol) === col("__gm"))
      .drop("__bin", "__b2", "__x2", "__gm", "__cm")
  }
}
