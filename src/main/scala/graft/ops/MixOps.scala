package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: rebalancing a multi-domain corpus toward a target
  * token distribution by deterministic downsampling — the "data mixture"
  * step of a pretraining pipeline (dominant domains shrink, rare ones
  * pass through whole).
  *
  * Unlike [[SampleOps.stratifiedHashSample]], the per-stratum fractions
  * are DERIVED FROM THE DATA: each stratum's keep-fraction targets an
  * equal share of the total token budget, `min(1, (total/n_strata) /
  * stratum_tokens)`. All inputs to the fraction are exact long sums, the
  * double math is one fixed expression shape, and membership is a hash
  * draw on the row key — so the sampled corpus is identical on any
  * partitioning, engine, or rerun.
  *
  * Plan shape: one aggregate over (stratum) — map-side combine, rows =
  * strata — a scalar total folded in by cross-joining the one-row
  * summary, and the fraction table broadcast back onto the corpus scan.
  * The corpus itself is scanned twice but never shuffled.
  */
object MixOps {

  def equalTokenDownsample(
      docs: DataFrame,
      keyCol: String,
      stratumCol: String,
      tokensCol: String
  ): DataFrame = {
    val perStratum = docs
      .groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("__stok"))
    val totals = perStratum
      .agg(sum("__stok").as("__total"), count(lit(1)).as("__n"))
    val fractions = perStratum
      .crossJoin(broadcast(totals))
      // fixed shape: (total→double / n) / stok — both engines evaluate
      // the identical IEEE expression tree, so thresholds match bitwise
      .withColumn("__f",
        least(lit(1.0),
          (col("__total").cast("double") / col("__n")) / col("__stok")))
      // floor-then-cast: Spark's double→long cast truncates while
      // DuckDB's rounds — floor() first makes them agree
      .withColumn("__thr", floor(col("__f") * SampleOps.HashSpace).cast("long"))
      .select(col(stratumCol), col("__thr"))
    docs
      .join(broadcast(fractions), Seq(stratumCol))
      .filter(SampleOps.hashDraw(col(keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Temperature sampling (the multilingual-pretraining mixture rule):
    * stratum s's target token share is stok_s^α / Σ_t stok_t^α, so its
    * keep-fraction is `min(1, share_s · total / stok_s)`. α = 1 keeps the
    * natural distribution (every fraction 1), α = 0 targets equal token
    * counts (≡ [[equalTokenDownsample]]), and 0 < α < 1 interpolates —
    * dominant strata shrink, rare ones pass through whole.
    *
    * Same plan shape as [[equalTokenDownsample]]: stratum-sized
    * aggregates, a broadcast fraction table, a scan-side hash draw; the
    * corpus never shuffles. The fraction rounds to 6 dp before the
    * threshold because `pow` may differ between engines in the last ulp
    * (unlike the division-only equal-token rule) — at HashSpace 65536 the
    * rounding granularity is far below one hash unit.
    */
  def temperatureDownsample(
      docs: DataFrame,
      keyCol: String,
      stratumCol: String,
      tokensCol: String,
      alpha: Double
  ): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    val perStratum = docs
      .groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).as("__stok"))
      .withColumn("__pw", pow(col("__stok").cast("double"), lit(alpha)))
    val totals = perStratum
      .agg(sum("__stok").as("__total"), sum("__pw").as("__z"))
    val fractions = perStratum
      .crossJoin(broadcast(totals))
      .withColumn("__f",
        round(least(lit(1.0),
          (col("__pw") / col("__z")) *
            (col("__total").cast("double") / col("__stok"))), 6))
      .withColumn("__thr", floor(col("__f") * SampleOps.HashSpace).cast("long"))
      .select(col(stratumCol), col("__thr"))
    docs
      .join(broadcast(fractions), Seq(stratumCol))
      .filter(SampleOps.hashDraw(col(keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Budget-prefix curation: per stratum, rank documents best-first
    * (`scoreCol` desc, `keyCol` tiebreak) and keep rows while the
    * cumulative token count BEFORE each row is under `budget` — i.e. the
    * shortest best-first prefix that reaches the budget, including the
    * row that crosses it. The "keep the best docs until the per-language
    * token budget is met" rule of curriculum/budgeted corpus builds —
    * deterministic, unlike the hash-draw mixers above, because the cut is
    * by rank, not by membership probability.
    *
    * One shuffle on the stratum plus an in-partition sort (the same
    * window class as top-N-per-group). A pathologically huge stratum
    * serializes into one task's sort — pre-cut such strata with a
    * [[temperatureDownsample]] pass or an approx-score cutoff (the
    * `w4b_quartile_approx` pattern) before the exact prefix.
    */
  def budgetPrefix(
      docs: DataFrame,
      keyCol: String,
      stratumCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col(scoreCol).desc, col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .filter(col("__cum") - col(tokensCol) < budget)
      .drop("__cum")
  }

  /** Sequence-packing efficiency card: for each candidate sequence
    * length L, the greedy NO-SPLIT first-fit pack (docs stay atomic;
    * docs longer than L take dedicated ⌈n/L⌉ sequences whose last
    * chunk pads) — reporting sequences used, total/pad tokens, and
    * fill in ppm. The number that picks the training seq-len BEFORE
    * committing the tokenizer run: too-short wastes on fragmentation,
    * too-long wastes on padding.
    *
    * Greedy reset-on-overflow is NOT associative, so there is no
    * honest global prefix-sum form — packing is per GROUP (the
    * shard/source boundary a real pipeline packs within anyway), one
    * shuffle + an in-row integer fold per (group, L), hot-key guarded.
    * Returns (group, seq_len, n_docs, total_tok, n_seqs, pad_tok,
    * fill_ppm).
    */
  def packEfficiency(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      seqLens: Seq[Int],
      maxDocsPerGroup: Long = 10000000L): DataFrame = {
    require(seqLens.nonEmpty, "packEfficiency needs candidate lengths")
    val sorted = sort_array(collect_list(
      struct(col(idCol).as("i"), col(tokensCol).cast("long").as("n"))))
    val grouped = docs
      .groupBy(col(groupCol).as("grp"))
      .agg(sorted.as("ds"), count(lit(1)).as("nd"),
        sum(col(tokensCol).cast("long")).as("total_tok"))
    val perL = seqLens.map { l =>
      val cap = l.toLong
      val acc0 = struct(lit(0L).as("fill"), lit(0L).as("seqs"),
        lit(0L).as("pad"))
      val fold = (acc: Column, x: Column) => {
        val n = x.getField("n")
        val fill = acc.getField("fill")
        val seqs = acc.getField("seqs")
        val pad = acc.getField("pad")
        val flushPad = when(fill > 0, lit(cap) - fill).otherwise(lit(0L))
        val flushSeq = when(fill > 0, 1L).otherwise(0L)
        when(n > cap,
          struct(lit(0L).as("fill"),
            (seqs + flushSeq + floor(n / lit(cap)).cast("long") +
              when(pmod(n, lit(cap)) > 0, 1L).otherwise(0L)).as("seqs"),
            (pad + flushPad +
              when(pmod(n, lit(cap)) > 0, lit(cap) - pmod(n, lit(cap)))
                .otherwise(lit(0L))).as("pad")))
          .when(fill + n <= cap,
            struct((fill + n).as("fill"), seqs.as("seqs"), pad.as("pad")))
          .otherwise(
            struct(n.as("fill"), (seqs + 1).as("seqs"),
              (pad + (lit(cap) - fill)).as("pad")))
      }
      val st = aggregate(col("ds"), acc0, fold)
      val seqsFinal = st.getField("seqs") +
        when(st.getField("fill") > 0, 1L).otherwise(0L)
      val padFinal = st.getField("pad") +
        when(st.getField("fill") > 0, lit(cap) - st.getField("fill"))
          .otherwise(lit(0L))
      grouped.select(col("grp").as(groupCol), lit(cap).as("seq_len"),
        col("nd").as("n_docs"), col("total_tok"),
        SessionOps.hotKeyGuarded(seqsFinal, col("nd"), col("grp"),
          maxDocsPerGroup, "packEfficiency").as("n_seqs"),
        padFinal.as("pad_tok"))
    }
    perL.reduce(_ unionAll _)
      .withColumn("fill_ppm",
        expr("total_tok * 1000000 div (n_seqs * seq_len)"))
  }

  /** Quantile normalization across sources (Bolstad et al. 2003, the
    * microarray-normalization classic, applied to corpus quality
    * scores): each source's score distribution maps onto the POOLED
    * distribution by rank, so a threshold like "top 30% quality" means
    * the same thing in every source even when their raw score scales
    * disagree — the harmonization step before any cross-source mixing
    * rule reads a score column.
    *
    * Resolution is `q` quantile buckets (the sketch-resolution trade
    * stated honestly — row-exact normalization needs a rank-range join
    * against the pooled spine, a nested-loop at scale): a row's
    * within-source midrank bucket b = ⌊(2r−1)·q / (2n)⌋ maps to the
    * pooled order statistic at the bucket's midpoint rank
    * t_b = ⌈(2b+1)·N / (2q)⌉ — ALL pure integer arithmetic, no
    * floating quantile math to disagree across engines. The SCORE
    * column is never arithmetic'd at all — only ordered, grouped, and
    * min'd — so fractional scores normalize exactly as integers do
    * (doubles read from the same storage order and compare
    * identically on both engines).
    *
    * Plan shape: one per-source rank window; the pooled value spine
    * (distinct scores + cumulative counts — the spearman spine
    * contract) joins q bucket targets in a broadcast, reduces to a
    * q-row bucket→value dim, and that dim broadcasts back onto the
    * row stream. Returns (idCol, grpCol, valCol, q_bucket, norm),
    * where norm is the pooled score at the bucket midpoint.
    */
  def quantileNormalize(
      df: DataFrame,
      grpCol: String,
      valCol: String,
      idCol: String,
      q: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(q >= 2, s"need at least 2 quantile buckets, got $q")
    val rows = df
      .filter(col(valCol).isNotNull && col(grpCol).isNotNull)
      .select(col(idCol), col(grpCol), col(valCol).as("__v"))
    val wG = Window.partitionBy(grpCol).orderBy(col("__v"), col(idCol))
    val ranked = rows
      .withColumn("__r", row_number().over(wG))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grpCol)))
      .withColumn("q_bucket",
        expr(s"((2 * __r - 1) * $q) div (2 * __n)"))
    // pooled spine: distinct values with cumulative counts
    val spine = rows.groupBy("__v").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(
        Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)))
    val nTot = rows.agg(count(lit(1)).as("__nt"))
    val buckets = spine.sparkSession.range(q.toLong)
      .select(col("id").cast("long").as("q_bucket"))
      .crossJoin(broadcast(nTot))
      .withColumn("__t", expr(s"((2 * q_bucket + 1) * __nt + 2 * $q - 1) div (2 * $q)"))
    // bucket -> pooled order statistic: min value whose cum reaches t
    val dim = buckets
      .join(broadcast(spine), col("__cum") >= col("__t"))
      .groupBy("q_bucket")
      .agg(min("__v").as("norm"))
    ranked
      .join(broadcast(dim), Seq("q_bucket"))
      .select(col(idCol), col(grpCol), col("__v").as(valCol),
        col("q_bucket"), col("norm"))
  }
}
