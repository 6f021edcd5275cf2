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
}
