package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical / rank statistics beyond the moment-based cards in
  * [[ProfileOps]]: Spearman rank correlation, the χ² independence test
  * with Cramér's V, mutual information, and the Gini concentration
  * coefficient. Like the rest of the exact-statistics family, every
  * surface is either a pure integer or a micro-rounded long derived from
  * EXACT integer/decimal moments in one fixed double operation order —
  * hash-replayable cross-engine, order- and partition-independent.
  */
object StatsOps {

  /** Spearman rank correlation between two numeric columns — the
    * monotone-association EDA card Pearson misses (outlier-robust,
    * captures any monotone curve, not just lines).
    *
    * Shape at scale: ranks are NOT a global sort of the data. Each
    * column reduces to its DISTINCT-VALUE spine (one map-side-combined
    * aggregation), the tie-averaged rank derives from the spine's
    * cumulative counts (a window over the spine, never the data — the
    * contract is bounded-domain columns: quantities, discounts, bucketed
    * measures), and the two rank dims broadcast back onto the scan. The
    * doubled rank 2·r̄ = 2·cum − cnt + 1 keeps tie-averaging in pure
    * integers (the ½ never floats); the constant factor cancels in r.
    *
    * Moments ride DECIMAL(38,0) (doubled ranks reach ~2n; their products
    * ~4n², summed over n rows overflow a long past ~10⁶ rows), and
    * Spearman ρ = Pearson over the doubled ranks evaluates in one fixed
    * double order. Returns ONE row: (n, rho_micro).
    */
  def spearman(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val data = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    def rankDim(c: String) = {
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      data.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .select(col("v").as(s"v_$c"),
          (col("cum") * 2 - col("cnt") + 1).as(s"r2_$c"))
    }
    val ranked = data
      .join(broadcast(rankDim("a")), col("a") === col("v_a"))
      .join(broadcast(rankDim("b")), col("b") === col("v_b"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(d38(col("r2_a"))).as("sx"),
      sum(d38(col("r2_b"))).as("sy"),
      sum(d38(col("r2_a")) * col("r2_a")).as("sxx"),
      sum(d38(col("r2_b")) * col("r2_b")).as("syy"),
      sum(d38(col("r2_a")) * col("r2_b")).as("sxy"))
    val dn = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = dn * d("sxy") - d("sx") * d("sy")
    val den = sqrt((dn * d("sxx") - d("sx") * d("sx")) *
      (dn * d("syy") - d("sy") * d("sy")))
    m.select(col("n"),
      round(num / den * lit(1000000.0)).cast("long").as("rho_micro"))
  }

  /** Pearson χ² independence cells between two categorical columns:
    * the full r×c contingency spine (absent cells surface at zero — a
    * missing cell still contributes its expected count to the
    * statistic), each with its expected count and χ² term. One cell
    * aggregation; margins derive FROM the cells (no second scan); the
    * spine is the margins' cross product — bounded by the domains, never
    * the data. Returns (va, vb, n_obs, exp_micro, chi_term_micro);
    * Σ chi_term_micro IS the statistic in micro units (micro-additive,
    * the per-digit-term pattern of [[ProfileOps.benfordAudit]]).
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // null categories drop BEFORE counting (as spearman/kendall do):
    // a null-keyed cell would inflate n and the margins while the
    // null-unsafe spine joins silently lost its row from the output
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("va"), col(bCol).as("vb"))
      .agg(count(lit(1)).as("n_obs"))
    val ra = cells.groupBy("va").agg(sum("n_obs").as("row_n"))
    val cb = cells.groupBy("vb").agg(sum("n_obs").as("col_n"))
    val tot = cells.agg(sum("n_obs").as("n"))
    val e = col("row_n").cast("double") * col("col_n") / col("n")
    val dev = col("n_obs").cast("double") - e
    broadcast(ra).crossJoin(broadcast(cb))
      .join(cells, Seq("va", "vb"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .select(col("va"), col("vb"), col("n_obs"),
        round(e * lit(1000000.0)).cast("long").as("exp_micro"),
        round(dev * dev / e * lit(1000000.0)).cast("long")
          .as("chi_term_micro"))
  }

  /** Cramér's V effect size from the [[chiSquareCells]] terms — the
    * [0,1]-normalized "how strongly associated" card (χ² alone grows
    * with n; V does not). One row:
    * (n, n_rows, n_cols, dof, chi2_micro, v_micro). V derives from the
    * micro-summed statistic in fixed double order; dof = (r−1)(c−1).
    * A single-valued margin (dof 0) reports V = 0.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chiSquareCells(df, aCol, bCol)
    val agg = cells.agg(
      sum("n_obs").as("n"),
      countDistinct("va").as("n_rows"),
      countDistinct("vb").as("n_cols"),
      sum("chi_term_micro").as("chi2_micro"))
    val minDim = least(col("n_rows"), col("n_cols")) - 1
    agg.select(col("n"), col("n_rows"), col("n_cols"),
      ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
      col("chi2_micro"),
      when(minDim < 1, 0L).otherwise(
        round(sqrt(col("chi2_micro").cast("double") / lit(1000000.0) /
          (col("n").cast("double") * minDim)) * lit(1000000.0))
          .cast("long")).as("v_micro"))
  }

  /** Mutual information between two categorical columns, as per-cell
    * contributions: I(X;Y) = Σ p(x,y)·ln(p(x,y)·n² / (c_x·c_y·n)) over
    * OBSERVED cells (empty cells contribute exactly zero to MI — unlike
    * χ², no spine is needed). Margins derive from the cells; each term
    * rounds to e-12 units before summation (the Σ c·ln c pattern of
    * [[ProfileOps.jsDivergence]]) so the total is an exact long sum.
    * Returns (va, vb, n_xy, mi_term_e12); Σ mi_term_e12 ≈ I in nats·10¹².
    */
  def mutualInfoCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // null categories drop BEFORE counting — same contract as
    // chiSquareCells/spearman: margins, n, and output must agree
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("va"), col(bCol).as("vb"))
      .agg(count(lit(1)).as("n_xy"))
    val ra = cells.groupBy("va").agg(sum("n_xy").as("c_x"))
    val cb = cells.groupBy("vb").agg(sum("n_xy").as("c_y"))
    val tot = cells.agg(sum("n_xy").as("n"))
    val term = (col("n_xy").cast("double") / col("n")) *
      log(col("n_xy").cast("double") * col("n") /
        (col("c_x").cast("double") * col("c_y")))
    cells
      .join(broadcast(ra), "va")
      .join(broadcast(cb), "vb")
      .crossJoin(broadcast(tot))
      .select(col("va"), col("vb"), col("n_xy"),
        round(term * lit(1000000000000.0)).cast("long").as("mi_term_e12"))
  }

  /** Mann-Whitney U / Wilcoxon rank-sum two-sample test between two
    * slices of a numeric column — the nonparametric "did the
    * distribution shift" test that needs no normality assumption
    * (median-shift detection for length/quality/score columns between
    * two sources or two pipeline runs). Complements the exact-KS
    * distance ([[ProfileOps.ksTest]]): KS is sensitive anywhere in the
    * CDF, rank-sum concentrates power on location shift.
    *
    * Exact-integer core, same machinery as [[spearman]]: the combined
    * sample reduces to its distinct-value spine; tie-averaged DOUBLED
    * ranks come from the spine's cumulative counts; 2·R_a = Σ c_a(v)·r2(v)
    * and 2·U_a = 2·R_a − n_a(n_a+1) stay pure integers (DECIMAL(38,0)
    * sums). The normal approximation with the standard tie correction
    * σ² = n_a·n_b/12·((n+1) − Σ(t³−t)/(n(n−1))) evaluates in one fixed
    * double order. Returns ONE row:
    * (n_a, n_b, u2_a, z_micro, reject) — u2_a = 2·U_a; reject at
    * two-sided α = 0.05 (|z| > 1.96).
    */
  def mannWhitney(
      df: DataFrame,
      sliceCol: String,
      a: String,
      b: String,
      valueCol: String): DataFrame = {
    val spine = df.filter(col(sliceCol).isin(a, b))
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(sliceCol) === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col(sliceCol) === b, 1L).otherwise(0L)).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = spine
      .withColumn("cum", sum("t").over(w))
      .withColumn("r2", col("cum") * 2 - col("t") + 1)
    val agg = ranked.agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      sum(col("ca").cast("decimal(38,0)") * col("r2")).as("r2a"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .as("tie3"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val u2 = col("r2a").cast("decimal(38,0)") -
      col("n_a").cast("decimal(38,0)") * (col("n_a") + 1)
    val mu2 = col("n_a").cast("double") * col("n_b") // = 2·(n_a·n_b/2)
    val sigma2 = col("n_a").cast("double") * col("n_b") / lit(12.0) *
      ((n + 1) - col("tie3").cast("double") / (n * (n - 1)))
    val z = (u2.cast("double") - mu2) / (lit(2.0) * sqrt(sigma2))
    agg.select(col("n_a"), col("n_b"),
      u2.cast("decimal(38,0)").cast("string").as("u2_a"),
      round(z * lit(1000000.0)).cast("long").as("z_micro"))
      .withColumn("reject", abs(col("z_micro")) > 1960000L)
  }

  /** Kendall's τ-b rank correlation between two BOUNDED-DOMAIN columns,
    * computed entirely from the contingency cells — never from data
    * pairs: concordant/discordant pair counts are Σ over ORDERED cell
    * pairs of n_ij·n_i'j' (each unordered data pair with distinct `a`
    * values appears under exactly one orientation), and the tie terms
    * come from the margins. The O(n²)-pairs definition collapses to
    * O(cells²) — the domains' product, independent of the data size —
    * so the whole statistic is one cell aggregation plus a broadcast
    * cell self-join.
    *
    * All counts are exact integers (DECIMAL(38,0) products); τ-b =
    * (P − Q)/√((n₀−n₁)(n₀−n₂)) evaluates in one fixed double order,
    * micro-rounded. Returns ONE row: (n, nc, nd, tau_micro).
    */
  def kendallTauB(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .select(col(aCol).as("va"), col(bCol).as("vb"))
      .filter(col("va").isNotNull && col("vb").isNotNull)
      .groupBy("va", "vb").agg(count(lit(1)).as("c"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val pairs = cells.as("x").crossJoin(broadcast(cells.as("y")))
      .filter(col("y.va") > col("x.va"))
      .agg(
        sum(when(col("y.vb") > col("x.vb"),
          d38(col("x.c")) * col("y.c")).otherwise(lit(0))).as("nc"),
        sum(when(col("y.vb") < col("x.vb"),
          d38(col("x.c")) * col("y.c")).otherwise(lit(0))).as("nd"))
    val margins = cells.agg(
      sum("c").as("n"),
      sum(d38(col("c")) * col("c")).as("sc2"))
    val ta = cells.groupBy("va").agg(sum("c").as("m"))
      .agg(sum(d38(col("m")) * col("m")).as("sa2"))
    val tb = cells.groupBy("vb").agg(sum("c").as("m"))
      .agg(sum(d38(col("m")) * col("m")).as("sb2"))
    val j = pairs.crossJoin(broadcast(margins))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
    // n₀ = n(n−1)/2; n₁ = Σ_a t(t−1)/2; n₂ = Σ_b t(t−1)/2 — kept as
    // DOUBLED integers (×2) so no halving floats anything
    val n0x2 = d38(col("n")) * col("n") - col("n")
    val n1x2 = col("sa2") - col("n")
    val n2x2 = col("sb2") - col("n")
    val tau = (col("nc").cast("double") - col("nd").cast("double")) /
      sqrt((n0x2 - n1x2).cast("double") / lit(2.0) *
        ((n0x2 - n2x2).cast("double") / lit(2.0)))
    j.select(col("n"), col("nc").cast("decimal(38,0)").cast("string").as("nc"),
      col("nd").cast("decimal(38,0)").cast("string").as("nd"),
      round(tau * lit(1000000.0)).cast("long").as("tau_micro"))
  }

  /** Robust outlier census per group: median/MAD in place of mean/σ
    * (the modified z-score of Iglewicz & Hoaglin 1993, 0.6745·(v−med)/MAD
    * with the 3.5 cut) — the outlier screen a10_zscore's moment form
    * cannot give when the outliers THEMSELVES inflate σ (masking). One
    * heavy value can arbitrarily corrupt mean±3σ; the median/MAD pair
    * has a 50% breakdown point.
    *
    * EXACT medians, never approximate: both the median and the MAD are
    * weighted lower medians read off cumulative counts over the
    * DISTINCT-VALUE spine (two spine shuffles; per-group windows run
    * over spine rows, never data rows — the ksTest/spearman contract).
    * The outlier count also evaluates on the spine (Σ counts where the
    * fixed-order double z exceeds the cut). A zero-MAD group (over half
    * its mass on one value) counts every v ≠ median as an outlier
    * (z = ∞ there, by convention). Values micro-rounded from exact
    * 6dp decimals. Returns (key, n, med_micro, mad_micro, n_outliers).
    */
  def robustZscore(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      zCut: Double = 3.5): DataFrame = {
    def v6(c: org.apache.spark.sql.Column) =
      round(c.cast("double"), 6).cast("decimal(18,6)")
    def lowerMedian(spine: DataFrame, vCol: String): DataFrame = {
      val w = Window.partitionBy("key").orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, 0)
      spine
        .withColumn("cum", sum("c").over(w))
        .withColumn("n", sum("c").over(Window.partitionBy("key")))
        .groupBy("key")
        // lower weighted median: smallest v whose cumulative count
        // reaches position ⌈n/2⌉ (cum·2 ≥ n) — the theilSen median rule
        .agg(max("n").as("n"),
          min(when(col("cum") * 2 >= col("n"), col(vCol))).as("med"))
    }
    val spine = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"), v6(col(valCol)).as("v"))
      .agg(count(lit(1)).as("c"))
    val med = lowerMedian(spine, "v")
    val withMed = spine.join(med, "key")
    val devSpine = withMed
      .groupBy(col("key"), abs(col("v") - col("med")).as("v"))
      .agg(sum("c").as("c"))
    val mad = lowerMedian(devSpine, "v")
      .select(col("key"), col("med").as("mad"))
    val z = lit(0.6745) * abs(col("v") - col("med")).cast("double") /
      col("mad").cast("double")
    withMed.join(mad, "key")
      .groupBy("key")
      .agg(max("n").as("n"),
        round(max(col("med")).cast("double") * lit(1000000.0)).cast("long")
          .as("med_micro"),
        round(max(col("mad")).cast("double") * lit(1000000.0)).cast("long")
          .as("mad_micro"),
        sum(when(
          when(col("mad") > 0, z > zCut).otherwise(col("v") =!= col("med")),
          col("c")).otherwise(0L)).as("n_outliers"))
  }

  /** Exact trimmed mean per group — the robust location estimate that
    * drops the lowest and highest ⌊n/denom⌋ observations (denom 10 =
    * the standard 10% trim) before averaging. No sort of the data: on
    * the distinct-value spine, each value's SURVIVING multiplicity is a
    * pure-integer window formula — kept(v) = max(0, min(cum, n−k) −
    * max(cum−c, k)) — so the trimmed sum is one exact decimal
    * aggregation over spine rows. The plain mean rides along for the
    * robustness delta. Returns (key, n, k_trim, mean_micro,
    * trimmed_mean_micro).
    */
  def trimmedMean(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      denom: Int = 10): DataFrame = {
    // denom ≤ 2 can trim EVERYTHING (even n, denom 2 → n_kept = 0 →
    // null from 0/0) — reject the parameter instead of emitting nulls
    require(denom > 2, s"trimmedMean: denom must be > 2 (got $denom) — " +
      "denom <= 2 trims every observation on even-sized groups")
    val v6 = round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
    val spine = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"), v6.as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("key").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = spine
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("key")))
      .withColumn("k", expr(s"n div ${denom}L"))
    val kept = greatest(lit(0L),
      least(col("cum"), col("n") - col("k")) -
        greatest(col("cum") - col("c"), col("k")))
    cum.groupBy("key")
      .agg(max("n").as("n"), max("k").as("k_trim"),
        sum(col("v") * col("c")).as("s_all"),
        sum(col("v") * kept).as("s_kept"),
        sum(kept).as("n_kept"))
      .select(col("key"), col("n"), col("k_trim"),
        round(col("s_all").cast("double") / col("n") * lit(1000000.0))
          .cast("long").as("mean_micro"),
        round(col("s_kept").cast("double") / col("n_kept") * lit(1000000.0))
          .cast("long").as("trimmed_mean_micro"))
  }

  /** Gini concentration coefficient of a count distribution per group —
    * the inequality card for token/document frequency ("is this source's
    * vocabulary dominated by a handful of terms?"): G = Σᵢ(2i−n−1)·cᵢ /
    * (n·Σc) over counts sorted ascending. ENTIRELY integer: the ranked
    * prefix identity folds to G = (2·Σi·cᵢ − (n+1)·Σc) / (n·Σc), so the
    * only non-integer step is one decimal division at the end
    * (micro-floored, the [[ProfileOps.tCloseness]] idiom).
    *
    * Shape: one window rank per group over the (group, item, count)
    * relation — vocab-sized, never data-sized — then one aggregation.
    * Input: (groupCol, itemCol, cntCol) counts. Returns
    * (group, n_items, gini_micro); a single-item group reports 0.
    */
  def giniCard(rel: DataFrame, groupCol: String, itemCol: String,
      cntCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(cntCol), col(itemCol))
    rel
      .withColumn("i", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_items"),
        sum(col(cntCol).cast("decimal(38,0)")).as("sc"),
        sum(col("i").cast("decimal(38,0)") * col(cntCol)).as("sic"))
      .select(col(groupCol), col("n_items"),
        expr("CAST(((2 * sic - (n_items + 1) * sc) * 1000000) div " +
          "(CAST(n_items AS DECIMAL(38,0)) * sc) AS BIGINT)")
          .as("gini_micro"))
  }

  /** Simpson's-paradox card (Simpson 1951): does the POOLED comparison
    * of a binary treatment's outcome means reverse inside the strata?
    * The aggregation trap every cross-source comparison risks — "source
    * A looks better overall" can be pure composition (A has more of the
    * easy stratum), which this card surfaces instead of leaving it to a
    * reader's vigilance.
    *
    * Per stratum (plus one '__pooled' row): group counts, exact-decimal
    * outcome means (micro), the A−B difference, and `reversed` — 1 when
    * the stratum's difference sign CONTRADICTS the pooled sign. One
    * aggregation (strata × 2 cells), the pooled row derived from the
    * same cells, the pooled sign broadcast back — nothing data-sized
    * moves twice. Strata where either group is empty carry
    * reversed = 0 (no comparison exists).
    *
    * Returns (stratum, n_a, n_b, mean_a_micro, mean_b_micro,
    * diff_micro, reversed).
    */
  def simpsonCard(
      df: DataFrame,
      stratumCol: String,
      grpCol: String,
      grpA: String,
      grpB: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("decimal(38,0)")
    val cells = df
      .filter(col(stratumCol).isNotNull &&
        (col(grpCol) === grpA || col(grpCol) === grpB) &&
        col(valCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(grpCol) === grpA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(grpCol) === grpB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(grpCol) === grpA, v).otherwise(lit(0).cast("decimal(38,0)"))).as("s_a"),
        sum(when(col(grpCol) === grpB, v).otherwise(lit(0).cast("decimal(38,0)"))).as("s_b"))
    val pooled = cells.agg(
      sum("n_a").as("n_a"), sum("n_b").as("n_b"),
      sum("s_a").as("s_a"), sum("s_b").as("s_b"))
      .withColumn("stratum", lit("__pooled"))
      .select("stratum", "n_a", "n_b", "s_a", "s_b")
    def meanMicro(s: Column, n: Column): Column =
      when(n > 0, round(s.cast("double") / n.cast("double") * lit(1000000.0))
        .cast("long")).otherwise(lit(null).cast("long"))
    val scored = cells.unionAll(pooled)
      .select(col("stratum"), col("n_a"), col("n_b"),
        meanMicro(col("s_a"), col("n_a")).as("mean_a_micro"),
        meanMicro(col("s_b"), col("n_b")).as("mean_b_micro"))
      .withColumn("diff_micro",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("mean_a_micro") - col("mean_b_micro"))
          .otherwise(lit(null).cast("long")))
    val pSign = scored.filter(col("stratum") === "__pooled")
      .select(signum(col("diff_micro").cast("double")).as("__ps"))
    scored.crossJoin(broadcast(pSign))
      .select(col("stratum"), col("n_a"), col("n_b"),
        col("mean_a_micro"), col("mean_b_micro"), col("diff_micro"),
        when(col("stratum") =!= "__pooled" && col("diff_micro").isNotNull &&
          signum(col("diff_micro").cast("double")) * col("__ps") < 0, 1L)
          .otherwise(0L).as("reversed"))
  }
}
