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

  /** Poisson-bootstrap confidence interval for the mean (Chamandy et
    * al., "Estimating Uncertainty for Massive Data Streams", Google TR
    * 2012 — the at-scale bootstrap): every row's multiplicity in
    * replicate b is an independent-ish Poisson(1) draw — the 16-bit
    * slice b mod 8 of md5(key:(b div 8)), eight replicate draws per
    * digest — so ALL `b` resamples ride ONE pass over the stream
    * (no per-replicate shuffles, no sampling-without-replacement
    * coordination — the whole reason this is the bootstrap that works
    * on 100 TB). Map-side combine leaves `b` partials per partition.
    *
    * Determinism: the Poisson(1) inverse CDF is applied to the 16-bit
    * draw through PRECOMPUTED integer thresholds (floor(cdf_k·65536),
    * k capped at 7 — tail mass 8.3e-5, documented truncation), so
    * multiplicities are pure integer comparisons; replicate sums ride
    * exact DECIMALs; the only doubles are the per-replicate mean
    * ratios, micro-rounded. CI bounds are the ⌈B·0.025⌉-th and
    * ⌈B·0.975⌉-th order statistics of the B replicate means.
    *
    * Returns ONE row: (n_rows, mean_micro, n_replicates, ci_lo_micro,
    * ci_hi_micro).
    */
  val PoissonThresholds: Seq[Long] = {
    val fact = Seq(1L, 1L, 2L, 6L, 24L, 120L, 720L)
    val e1 = math.exp(-1.0)
    fact.indices.map { k =>
      val cdf = (0 to k).map(j => e1 / fact(j)).sum
      math.floor(cdf * 65536.0).toLong
    }
  }

  def bootstrapCi(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      b: Int = 64): DataFrame = {
    require(b >= 40, "bootstrapCi needs enough replicates for the 2.5% rank")
    require(b % 8 == 0, "bootstrapCi needs b in whole md5 chunks of 8")
    // each md5 digest yields EIGHT independent 16-bit draws (32 hex
    // chars = 8 slices), so a row pays b/8 hashes, not b — computed
    // BEFORE the explode so the per-replicate rows only slice.
    // The threshold comparison is a flat sum, NOT a HOF lambda:
    // codegen's subexpression elimination then evaluates each slice
    // once — a lambda body re-evaluates its outer reference per
    // element (the winnow lesson).
    val digests = array((0 until b / 8).map(c =>
      md5(concat(col("kk"), lit(s":$c")))): _*)
    val u = conv(
      call_function("substring",
        element_at(col("hs"), expr("b div 8").cast("int") + lit(1)),
        (pmod(col("b"), lit(8)) * lit(4) + lit(1)).cast("int"),
        lit(4)),
      16, 10).cast("long")
    val mult = PoissonThresholds
      .map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
    // ONE job end-to-end (r15): each replicate's group sees every
    // source row exactly once, so the GLOBAL row count and decimal sum
    // ride the same per-b aggregation (every b-group carries identical
    // (sv, cnt) — max() picks the shared value), and the CI order
    // statistics come out of a sorted B-element array instead of a
    // window rank + two filter branches + two broadcast crossJoins.
    // The old plan re-derived the scan→explode→aggregate pipeline
    // THREE times (lo, hi, and the base mean each compiled and ran
    // it) — a fixed multi-job floor the flat ×10 ratio fingerprinted
    // (4.63 s at sf0.1 vs 4.75 s at ×10 data).
    val rep = df
      .select(round(col(valueCol), 6).cast("decimal(18,6)").as("v"),
        col(keyCol).cast("string").as("kk"))
      .withColumn("hs", digests)
      .select(col("v"), col("hs"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("mult", mult)
      .groupBy("b")
      .agg(sum(col("v") * col("mult").cast("decimal(18,0)")).as("s"),
        sum("mult").as("n"),
        sum("v").as("sv"),
        count(lit(1)).as("cnt"))
      .select(col("b"),
        round(col("s").cast("double") / col("n") * lit(1000000.0))
          .cast("long").as("m"),
        col("sv"), col("cnt"))
    val loRk = math.ceil(b * 0.025).toInt
    val hiRk = math.ceil(b * 0.975).toInt
    // sort_array on struct(m, b) is the lexicographic (m, b) ascending
    // order the old Window.orderBy(m, b) ranked by; element_at is
    // 1-indexed like row_number. Empty input leaves cnt null — filter
    // to zero rows, matching the old crossJoin-with-empty behavior.
    // bounded: the collect_list input is the replicate-mean table —
    // EXACTLY b (=64) rows regardless of corpus size or key skew.
    rep
      .agg(sort_array(collect_list(struct(col("m"), col("b")))).as("ms"),
        max("sv").as("sv"), max("cnt").as("cnt"))
      .filter(col("cnt").isNotNull)
      .select(col("cnt").as("n_rows"),
        round(col("sv").cast("double") / col("cnt") * lit(1000000.0))
          .cast("long").as("mean_micro"),
        lit(b.toLong).as("n_replicates"),
        element_at(col("ms"), loRk).getField("m").as("ci_lo_micro"),
        element_at(col("ms"), hiRk).getField("m").as("ci_hi_micro"))
  }
}
