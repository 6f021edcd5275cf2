package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference modeling — the reward-model data-prep stage of
  * an LLM training pipeline: turn an interaction log into (winner,
  * loser) comparison counts, then fit Bradley-Terry strengths with the
  * classic MM algorithm (Hunter, "MM algorithms for generalized
  * Bradley-Terry models", Annals of Statistics 2004) run IN-ENGINE,
  * the ClassifierOps/k-means contract: every iteration is one bounded
  * aggregation over the comparison table, the weight vector is the
  * only thing that ever reaches the driver, and the whole chain
  * replays in the DuckDB oracle.
  *
  * Execution shape at 100 TB: [[pairsFromLog]] is the only
  * corpus-sized step — one window shuffle on the session key plus one
  * map-side-combined aggregate down to at most |items|² rows. The MM
  * iterations run over THAT table (items² ≪ corpus, the same
  * vocab-not-corpus argument as BPE training), so fit cost is
  * independent of log size. Elo-style sequential updates are
  * deliberately absent: they impose a total order on a distributed
  * log (a single-partition fold); BT over aggregated counts is the
  * order-free, shuffle-parallel estimator of the same quantity.
  *
  * Numeric contract: per-pair MM terms round to 6dp and sum in
  * DECIMAL (exact, order-independent); weight updates and the final
  * normalization round to 6dp — the text_lm_score pattern, so both
  * engines fold the identical doubles.
  */
object PreferenceOps {

  val DefaultIters = 3

  /** Comparison counts from an event log: within each `keyCol` stream
    * ordered by (`tsCol`, `tieCol`), every consecutive transition
    * a→b with a≠b is one "b beats a" observation (the later action
    * supersedes the earlier — the implicit-preference reading of a
    * click/purchase log). One shuffle (the per-key window), then the
    * aggregate collapses to ≤ items² rows.
    */
  def pairsFromLog(events: DataFrame, keyCol: String = "user_id",
      itemCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(itemCol).as("cur"),
        lag(col(itemCol), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull && col("prev") =!= col("cur"))
      .select(col("cur").as("winner"), col("prev").as("loser"))
      .groupBy("winner", "loser")
      .agg(count(lit(1)).as("n"))
  }

  /** Symmetric games view of a (winner, loser, n) table:
    * (item, opp, games) with games = n(i beats j) + n(j beats i).
    */
  def gamesView(pairs: DataFrame): DataFrame =
    pairs.select(col("winner").as("item"), col("loser").as("opp"), col("n"))
      .unionAll(
        pairs.select(col("loser").as("item"), col("winner").as("opp"), col("n")))
      .groupBy("item", "opp")
      .agg(sum("n").as("games"))

  /** Bradley-Terry strengths by `iters` MM updates from uniform init,
    * normalized to a probability vector each round:
    *
    *   w_i ← W_i / Σ_{j≠i} N_ij / (w_i + w_j)   then   w ← w / Σ w
    *
    * (W_i = total wins of i, N_ij = games between i and j). Items with
    * zero wins converge to strength 0, which the MM update handles
    * exactly (the numerator is 0). The current weights enter each
    * round as expression LITERALS (a when-ladder over the bounded item
    * set — the k-means centroid pattern); the per-round collect is the
    * |items|-row weight vector, never data.
    *
    * Returns (item, wins, n_games, strength) — the FINAL round is
    * returned as the un-collected DataFrame, so the result plan is
    * engine-side end to end.
    */
  def btStrengths(pairs0: DataFrame, iters: Int = DefaultIters): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the comparison table is ≤ items² rows; caching IT (not its
    // derivations) means the corpus-sized pair extraction runs ONCE and
    // wins / games / every MM round read the bounded cache (measured
    // 1.8s → corpus touched once at sf0.1 — three window passes
    // collapsed into one)
    val pairs = pairs0.cache()
    val sym = gamesView(pairs)
    val wins = pairs.select(col("winner").as("item"), col("n"))
      .groupBy("item").agg(sum("n").as("wins"))
    val gamesTot = sym.groupBy("item").agg(sum("games").as("n_games"))
    val items = sym.select("item").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(items.nonEmpty, "btStrengths needs at least one comparison")

    def wl(c: Column, w: Map[String, Double]): Column =
      items.foldLeft(lit(Double.NaN)) { (acc, it) =>
        when(c === it, lit(w(it))).otherwise(acc)
      }

    var w: Map[String, Double] = items.map(_ -> 1.0).toMap
    var result: DataFrame = null
    for (i <- 1 to iters) {
      val denom = sym
        .select(col("item"),
          round(col("games").cast("double") /
            (wl(col("item"), w) + wl(col("opp"), w)), 6)
            .cast("decimal(28,12)").as("term"))
        .groupBy("item")
        .agg(sum("term").as("denom"))
      // an item in `sym` always has wins ≥ 0; left join keeps items
      // that never won (wins null → 0 → strength 0)
      val raw = denom
        .join(wins, Seq("item"), "left")
        .select(col("item"),
          coalesce(col("wins"), lit(0L)).as("wins"),
          round(coalesce(col("wins"), lit(0L)).cast("double") /
            col("denom").cast("double"), 6).as("w_raw"))
      val tot = raw.agg(
        sum(col("w_raw").cast("decimal(28,6)")).as("s"))
      val strengths = raw.crossJoin(broadcast(tot))
        .select(col("item"), col("wins"),
          round(col("w_raw") / col("s").cast("double"), 6).as("strength"))
      if (i == iters)
        result = strengths.join(gamesTot, Seq("item"))
          .select(col("item"), col("wins"), col("n_games"), col("strength"))
      else
        w = strengths.select("item", "strength")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    result
  }
}
