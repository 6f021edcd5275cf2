package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout: deterministic hash assignment and the
  * Welch-t lift estimate, computed in ONE map-side-combined aggregation
  * over exact decimal moments.
  */
object ExperimentOps {

  /** Two-arm readout for a metric column:
    *
    *   - assignment is BY UNIT (the md5 draw on `unitCol` — same
    *     deterministic split machinery as SampleOps), so a unit's
    *     every event lands in one arm (the no-contamination rule);
    *     the variance is still event-level — the cluster-randomized
    *     caveat applies when units contribute many events;
    *   - per-arm n / Σv / Σv² accumulate as exact DECIMALs from
    *     6dp-rounded values (order-independent, partition-independent),
    *     ONE aggregation to one row — no shuffle wider than the
    *     conditional sums;
    *   - the only float arithmetic is the final mean/variance/t
    *     expressions over those exact moments, evaluated in a fixed
    *     operation order and micro-rounded, so the row replays
    *     bit-identically: Welch t = (m_a − m_b)/√(v_a/n_a + v_b/n_b)
    *     with the n−1 sample variances.
    *
    * Returns ONE row: (n_a, n_b, mean_a_micro, mean_b_micro, lift_ppm,
    * t_micro); lift is (m_a − m_b)/m_b in ppm, 0 when m_b = 0.
    */
  def abLift(
      events: DataFrame,
      unitCol: String,
      valueCol: String): DataFrame = {
    val armA = SampleOps.hashDraw(col(unitCol)) < SampleOps.HashSpace / 2
    val v = round(col(valueCol), 6).cast("decimal(18,6)")
    val moments = events
      .select(armA.as("a"), v.as("v"))
      .agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("a"), col("v")).otherwise(lit(0).cast("decimal(18,6)")))
          .as("s1a"),
        sum(when(!col("a"), col("v")).otherwise(lit(0).cast("decimal(18,6)")))
          .as("s1b"),
        sum(when(col("a"), col("v") * col("v"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("s2a"),
        sum(when(!col("a"), col("v") * col("v"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("s2b"))
    val ma = col("s1a").cast("double") / col("n_a")
    val mb = col("s1b").cast("double") / col("n_b")
    val va = (col("s2a").cast("double") -
      col("s1a").cast("double") * col("s1a").cast("double") / col("n_a")) /
      (col("n_a") - 1)
    val vb = (col("s2b").cast("double") -
      col("s1b").cast("double") * col("s1b").cast("double") / col("n_b")) /
      (col("n_b") - 1)
    moments.select(
      col("n_a"), col("n_b"),
      round(ma * lit(1000000.0)).cast("long").as("mean_a_micro"),
      round(mb * lit(1000000.0)).cast("long").as("mean_b_micro"),
      when(col("s1b") === 0, 0L)
        .otherwise(round((ma - mb) / mb * lit(1000000.0)).cast("long"))
        .as("lift_ppm"),
      round((ma - mb) / sqrt(va / col("n_a") + vb / col("n_b")) *
        lit(1000000.0)).cast("long").as("t_micro"))
  }
}
