package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak supervision (the Snorkel pattern, Ratner et al., VLDB 2018):
  * when ground-truth labels don't exist at corpus scale, PROGRAMMATIC
  * labeling functions — noisy, partial heuristics that can abstain —
  * vote on every row, and a label model resolves the votes into
  * training labels. The expensive part at 100 TB is exactly what Spark
  * is good at: every labeling function here is a scan-side Column
  * expression (no shuffle, no UDF), so labeling a corpus is one pass,
  * and the vote resolution is per-row integer arithmetic — hash-exact
  * by construction (votes are integers; no float enters the surface).
  *
  * Vote encoding: 1 = positive, 0 = negative, −1 = abstain.
  */
object WeakLabelOps {

  /** Three heuristic is-English labeling functions over a token array:
    * stopword presence (never abstains), the n-gram language-ID ladder
    * (abstains on 'und'), and a mean-token-length band (one-sided:
    * votes 1 in band, abstains out of band). Mean length uses the exact
    * micro-unit floor arithmetic ([[ClassifierOps.microFeatures]]'
    * contract).
    */
  def englishLfs(toks: Column): Seq[Column] = {
    val lfStop = when(TextOps.stopwordCount(toks) >= 1, 1L).otherwise(0L)
    val lid = TextOps.langId(toks)
    val lfLang = when(lid === "und", -1L)
      .when(lid === "en", 1L).otherwise(0L)
    val mlenMicro = floor(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)) *
        lit(1000000.0) / size(toks).cast("double")).cast("long")
    val lfLen = when(mlenMicro >= 4200000L && mlenMicro <= 4800000L, 1L)
      .otherwise(-1L)
    Seq(lfStop, lfLang, lfLen)
  }

  /** Majority-vote label model over labeling-function votes: per row
    * the non-abstain count, positive count, and the resolved label
    * (1 / 0, or −1 on ties and all-abstain rows — surfaced, not
    * silently coerced, so downstream can route them to a fallback).
    */
  def majorityLabel(docs: DataFrame, lfs: Seq[Column],
      keyCols: Seq[Column]): DataFrame = {
    val votes = lfs.zipWithIndex.map { case (lf, i) => lf.as(s"v$i") }
    val voted = docs.select(keyCols ++ votes: _*)
    val vCols = lfs.indices.map(i => col(s"v$i"))
    val nVotes = vCols.map(v => when(v >= 0L, 1L).otherwise(0L)).reduce(_ + _)
    val nPos = vCols.map(v => when(v === 1L, 1L).otherwise(0L)).reduce(_ + _)
    voted
      .withColumn("n_votes", nVotes)
      .withColumn("n_pos", nPos)
      .withColumn("majority",
        when(col("n_pos") * 2 > col("n_votes"), 1L)
          .when(col("n_pos") * 2 < col("n_votes"), 0L)
          .otherwise(-1L))
  }

  /** Pairwise Cohen's κ between labeling functions (Cohen 1960) — the
    * LF-diagnostics half of the Snorkel workflow: two LFs that agree no
    * better than chance (κ≈0) are independent signals worth keeping;
    * κ≈1 means one is redundant; κ<0 flags a mislabeled heuristic.
    * Restricted per pair to rows where BOTH vote (abstentions carry no
    * agreement evidence).
    *
    * One corpus pass computes every pair's sufficient statistics in a
    * SINGLE aggregation (4 integer sums per pair — LF-count-invariant
    * scan, the dq_constraints shape); κ derives from exact integers via
    * identical double arithmetic and an integer floor, so the surface
    * is hash-exact. Degenerate guards: no co-voting rows → κ=0;
    * pₑ=1 (both LFs constant and equal) → κ=1e6 by convention.
    *
    * Returns one row per unordered pair:
    * (lf_a, lf_b, n_both, n_agree, kappa_micro).
    */
  def pairKappa(docs: DataFrame, lfs: Seq[Column]): DataFrame = {
    require(lfs.length >= 2, "pairKappa needs at least two labeling functions")
    val voted = docs.select(
      lfs.zipWithIndex.map { case (lf, i) => lf.as(s"v$i") }: _*)
    val pairs = for {
      a <- lfs.indices; b <- lfs.indices if a < b
    } yield (a, b)
    val aggs = pairs.flatMap { case (a, b) =>
      val both = col(s"v$a") >= 0L && col(s"v$b") >= 0L
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"n_${a}_$b"),
        sum(when(both && col(s"v$a") === col(s"v$b"), 1L).otherwise(0L))
          .as(s"ag_${a}_$b"),
        sum(when(both && col(s"v$a") === 1L, 1L).otherwise(0L))
          .as(s"a1_${a}_$b"),
        sum(when(both && col(s"v$b") === 1L, 1L).otherwise(0L))
          .as(s"b1_${a}_$b"))
    }
    val row = voted.agg(aggs.head, aggs.tail: _*)
    pairs.map { case (a, b) =>
      val n = col(s"n_${a}_$b")
      val ag = col(s"ag_${a}_$b")
      val a1 = col(s"a1_${a}_$b")
      val b1 = col(s"b1_${a}_$b")
      val po = ag.cast("double") / n.cast("double")
      val pe = (a1 * b1 + (n - a1) * (n - b1)).cast("double") /
        (n * n).cast("double")
      row.select(
        lit(a.toLong).as("lf_a"), lit(b.toLong).as("lf_b"),
        n.as("n_both"), ag.as("n_agree"),
        when(n === 0L, 0L)
          .when(lit(1.0) - pe === 0.0, 1000000L)
          .otherwise(floor((po - pe) / (lit(1.0) - pe) * lit(1000000.0))
            .cast("long"))
          .as("kappa_micro"))
    }.reduce(_.unionAll(_))
  }
}
