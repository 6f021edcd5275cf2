package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-key exponential moving average (α = 1/2) over the event-time
    * order — the anomaly-baseline / trend-smoothing primitive a window
    * function cannot express (EMA is recursive: each value depends on
    * the previous SMOOTHED value, not a frame of raw ones).
    *
    * One shuffle to the key, then a single in-row fold over the sorted
    * event list (the K1 state-machine shape), emitting every
    * intermediate smoothed value. Carries the [[SessionOps]] hot-key
    * guard: the per-key count rides the same aggregation and a
    * pathological key fails loudly instead of OOMing the fold at 100×.
    *
    * Numeric contract: the smoothed state lives in scale-0 micro longs
    * — s₀ = round(v₀·1e6), sₜ = round(0.5·vₜ·1e6 + 0.5·sₜ₋₁) — every
    * round a portable scale-0 on identical doubles, so the whole
    * recursion replays in the oracle's recursive CTE.
    *
    * Input needs (keyCol, tsCol, seqCol, valCol); ties order by seqCol.
    * Returns (key, seq, ema_micro) for every input row.
    */
  def emaSmooth(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      valCol: String,
      maxEventsPerKey: Long = SessionOps.DefaultMaxEventsPerKey
  ): DataFrame = {
    val sorted = sort_array(collect_list(
      struct(col(tsCol).as("t"), col(seqCol).as("q"), col(valCol).as("v"))))
    val acc0 = struct(
      lit(Array.empty[Long]).as("emas"),
      lit(0L).as("last"),
      lit(false).as("started"))
    val fold = (acc: Column, x: Column) => {
      val ema = when(!acc.getField("started"),
        round(x.getField("v") * lit(1000000.0)))
        .otherwise(round(lit(0.5) * x.getField("v") * lit(1000000.0) +
          lit(0.5) * acc.getField("last").cast("double")))
        .cast("long")
      struct(
        concat(acc.getField("emas"), array(ema)).as("emas"),
        ema.as("last"),
        lit(true).as("started"))
    }
    events
      .groupBy(col(keyCol))
      .agg(sorted.as("evs"), count(lit(1)).as("n"))
      .select(col(keyCol),
        SessionOps.hotKeyGuarded(
          zip_with(
            transform(col("evs"), e => e.getField("q")),
            aggregate(col("evs"), acc0, fold).getField("emas"),
            (a, b) => struct(a.as("q"), b.as("m"))),
          col("n"), col(keyCol), maxEventsPerKey, "emaSmooth").as("z"))
      .select(col(keyCol), explode(col("z")).as("p"))
      .select(col(keyCol), col("p.q").as(seqCol), col("p.m").as("ema_micro"))
  }
}
