package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series densification: filling the silent gaps an event log
  * doesn't record. Downstream models (rate charts, anomaly baselines,
  * training-curriculum schedules) need a row for every bucket, including
  * the empty ones.
  */
object TimeSeriesOps {

  /** Dense per-key bucket grid with aggregated values; missing buckets
    * surface with `fillValue`.
    *
    * Shape at scale: aggregate FIRST (events collapse to one short row
    * per nonempty (key, bucket) — map-side partial combine), then each
    * key's span generates its grid with `explode(sequence(...))` — the
    * generated rows never touch the raw event stream, and generation is
    * distributed per key, never a driver loop or a global calendar
    * cross-join. The grid left-joins the (already tiny) aggregates on
    * (key, bucket); both sides hash the same key pair, one aligned
    * shuffle each.
    *
    * `tsCol` is numeric (epoch micros), non-negative; buckets are
    * `ts div bucketWidth`. Each key's grid spans ITS OWN [min, max]
    * bucket — global alignment is the caller's concern (pass an explicit
    * spine if the fleet must share one).
    */
  def gapFillCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      bucketWidth: Long,
      fillValue: Long = 0L
  ): DataFrame = {
    val perBucket = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__bkt", expr(s"$tsCol div ${bucketWidth}L"))
      .groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__n"))
    val grid = perBucket
      .groupBy(col(keyCol))
      .agg(min("__bkt").as("__lo"), max("__bkt").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("__bkt"))
    grid
      .join(perBucket, Seq(keyCol, "__bkt"), "left")
      .select(col(keyCol),
        (col("__bkt") * bucketWidth).as("bucket_start"),
        coalesce(col("__n"), lit(fillValue)).as("n_events"))
  }
}
