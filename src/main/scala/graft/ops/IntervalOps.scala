package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union ("merge overlapping intervals") per key — the temporal
  * coverage operator: variable-length intervals collapse into maximal
  * disjoint islands. Unlike gap-based sessionization ([[SessionOps]],
  * which chains point events by inter-START gap), this honors each
  * interval's own END, so containment (a long interval swallowing later
  * short ones) merges correctly.
  *
  * One shuffle on the key; both windows share the same (key, start, tie)
  * sort order so Spark plans a single Exchange+Sort.
  */
object IntervalOps {

  /** Merge overlapping `[startCol, endCol)` intervals per `keyCol`.
    * An interval starts a new island iff its start exceeds the running
    * max end of ALL prior intervals (running max, not lag: a contained
    * interval must not end an island its container keeps open).
    * `tieCol` makes equal-start ordering deterministic.
    *
    * Output: one row per island — key, island_start, island_end, n_merged.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      tieCol: String
  ): DataFrame = {
    val order = Window
      .partitionBy(keyCol)
      .orderBy(col(startCol), col(tieCol))
    val priorMaxEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new_island",
        when(priorMaxEnd.isNull || col(startCol) > priorMaxEnd, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Allen's interval algebra (Allen, CACM 1983): the relation of
    * [s1, e1] to [s2, e2], one of the THIRTEEN mutually exclusive,
    * jointly exhaustive relations — the complete vocabulary of
    * temporal-pair reasoning (scheduling conflicts, containment
    * audits, causal ordering). Implemented as one CASE ladder over
    * exact integer endpoints, evaluated most-specific-first (equals
    * and the endpoint-coincidence relations before the open-interval
    * ones), so every pair lands in exactly one bucket.
    */
  def allenRelation(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    when(s1 === s2 && e1 === e2, "equals")
      .when(e1 < s2, "precedes")
      .when(e1 === s2, "meets")
      .when(e2 < s1, "preceded_by")
      .when(e2 === s1, "met_by")
      .when(s1 === s2 && e1 < e2, "starts")
      .when(s1 === s2, "started_by")
      .when(e1 === e2 && s1 > s2, "finishes")
      .when(e1 === e2, "finished_by")
      .when(s1 > s2 && e1 < e2, "during")
      .when(s1 < s2 && e1 > e2, "contains")
      .when(s1 < s2, "overlaps")
      .otherwise("overlapped_by")
}
