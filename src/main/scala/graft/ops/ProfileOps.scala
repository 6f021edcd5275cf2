package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column null counts, distinct counts, and
  * min/max — the data-quality summary a pipeline computes before/after
  * every transform stage.
  *
  * Shape at scale: one independent single-column aggregate per profiled
  * column, unioned. Each branch's parquet scan prunes to THAT column
  * (columnar I/O: the table is read once in total), its partial
  * aggregates combine map-side, and only distinct values cross the
  * shuffle. The tempting one-pass formulation — one aggregate with six
  * `count(distinct)`s — plans an Expand that duplicates every row per
  * distinct column BEFORE the shuffle (measured 6× the shuffle volume
  * and ~10× the runtime here); per-column branches are the shape that
  * survives a wide table at 100 TB. Exact distincts are oracle-checkable;
  * pass `exact = false` to flip to HLL sketches (no distinct shuffle at
  * all) when estimates suffice.
  *
  * Values are surfaced as strings (numerics through DECIMAL(18,6), so
  * both engines print identical fixed-scale forms; timestamps as epoch
  * micros upstream of the call).
  */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    def asStr(c: Column, name: String): Column = df.schema(name).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        c.cast("decimal(18,6)").cast("string")
      case _ => c.cast("string")
    }
    cols.map { c =>
      df.select(col(c)).agg(
        // coalesce: sum over ZERO rows is null, but "no nulls seen" is 0
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as("n_nulls"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as("n_distinct"),
        asStr(min(col(c)), c).as("min_val"),
        asStr(max(col(c)), c).as("max_val"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_val"), col("max_val"))
    }.reduce(_.unionAll(_))
  }
}
