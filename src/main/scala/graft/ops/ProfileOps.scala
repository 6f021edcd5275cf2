package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column null counts, distinct counts, and
  * min/max, as ONE aggregation pass over the table — the data-quality
  * summary a pipeline computes before/after every transform stage.
  *
  * Shape at scale: a single global aggregate (partial map-side combine,
  * one tiny final row) fanned back out to one row per column with
  * `stack`. The exact multi-column `count(distinct)` plans an Expand
  * (one duplicated row stream per distinct column) — exact is what the
  * oracle can check; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL, no Expand) via `exact = false`.
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
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        asStr(min(col(c)), c).as(s"__mn_$c"),
        asStr(max(col(c)), c).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
  }
}
