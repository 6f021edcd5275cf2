package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: compacting an append-only changelog into
  * point-in-time state. The reference's event-sourced entity model
  * (SURVEY.md §2e K3, model.py:68-164) reconstructs state by folding the
  * whole log; these operators are the two standard materializations a
  * warehouse keeps alongside the log — the latest-wins snapshot (type-1
  * upsert) and the validity-interval history (type-2 SCD).
  */
object ChangeOps {

  /** Latest-wins snapshot: one row per key — the change with the highest
    * `(ordCols…)` version vector. The whole changelog compacts in ONE
    * shuffle with map-side partial aggregation: `max(struct(ord…, payload))`
    * orders lexicographically on the leading struct fields, so each
    * partition forwards a single candidate row per key. The window
    * formulation (`row_number desc = 1`) is equivalent but SHUFFLES every
    * version of every key; at 100 TB of changelog the aggregate shape is
    * the only one that survives. Physical note: a struct max has no
    * mutable hash buffer, so Spark plans a SortAggregate — the partial
    * sort is by GROUP KEY within each input partition (cheap, pre-combine)
    * and the exchange still carries one candidate per key per partition;
    * the window form's sort is over the exchanged FULL version history.
    *
    * `ordCols` must be a total order per key (e.g. ts + change id) or the
    * winner is nondeterministic by exactly the ambiguity in the data.
    */
  def latestSnapshot(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      payloadCols: Seq[String]
  ): DataFrame = {
    val versioned = struct((ordCols ++ payloadCols).map(col): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(versioned).as("__last"))
      .select(keyCols.map(col) ++
        (ordCols ++ payloadCols).map(c => col(s"__last.$c").as(c)): _*)
  }

  /** MERGE-style change application: fold a changelog of upserts and
    * deletes into an existing snapshot, producing the next snapshot —
    * what a lakehouse `MERGE INTO` does, expressed as two shuffles that
    * both scale: (1) the changelog reduces to ONE winning change per key
    * (the [[latestSnapshot]] `max(struct)` shape — map-side combine, no
    * sort), (2) touched keys leave the snapshot via a left-anti join and
    * the winners that are upserts union back in. The snapshot is never
    * sorted or widened; deletes of absent keys and upserts of new keys
    * are both just rows of the winners table.
    *
    * Contract: the changelog is strictly newer than the snapshot (the
    * standard incremental-batch handoff); `ordCols` totally order each
    * key's changes (e.g. ts + change id); `opCol` holds
    * 'upsert'/'delete'. Snapshot columns: keyCols ++ payloadCols.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      payloadCols: Seq[String],
      opCol: String = "op"
  ): DataFrame = {
    val versioned = struct(((ordCols :+ opCol) ++ payloadCols).map(col): _*)
    val winners = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(versioned).as("__last"))
      .select(keyCols.map(col) ++
        ((opCol +: payloadCols).map(c => col(s"__last.$c").as(c))): _*)
    val untouched = snapshot
      .join(winners.select(keyCols.map(col): _*), keyCols, "left_anti")
      .select((keyCols ++ payloadCols).map(col): _*)
    val upserted = winners
      .filter(col(opCol) === "upsert")
      .select((keyCols ++ payloadCols).map(col): _*)
    untouched.unionByName(upserted)
  }

  /** Type-2 slowly-changing-dimension history: each change row becomes a
    * validity interval `[ordCol, next change's ordCol)`; the key's last
    * change stays open (null `valid_to`). One shuffle + one in-partition
    * sort (the lead window); `tieCol` breaks equal-timestamp changes
    * deterministically.
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      tieCol: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"
  ): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(tieCol))
    changes
      .withColumn(validFrom, col(ordCol))
      .withColumn(validTo, lead(col(ordCol), 1).over(w))
  }

  /** Per-key partial-aggregate summary in micro-long units — the
    * MERGEABLE state for incremental aggregate-view maintenance: count,
    * sum, min, max are all algebraic, so summaries built from disjoint
    * batches merge EXACTLY into the summary of the union (see
    * [[mergeSummaries]]). Values enter as scale-0 micro longs
    * (`round(v·1e6)`, the portable cross-engine round), so every later
    * merge is exact integer arithmetic — no float drift however many
    * incremental batches fold in.
    */
  def microSummary(
      rows: DataFrame,
      keyCols: Seq[String],
      valCol: String): DataFrame =
    rows
      .select(keyCols.map(col) :+
        round(col(valCol) * 1e6, 0).cast("long").as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum("__v").as("sum_micro"),
        min("__v").as("min_micro"), max("__v").as("max_micro"))

  /** Incremental aggregate maintenance: fold one or more delta-batch
    * summaries into a stored base summary WITHOUT rescanning the base
    * facts — the materialized-view refresh that makes a 100 TB rollup
    * affordable (the base is summary-sized, only the delta batch is
    * fact-sized; a full recompute would rescan everything).
    *
    * One shuffle over summary-sized inputs: union the partials, re-group
    * on the key, merge each aggregate with its own combiner (Σn, Σsum,
    * min-of-mins, max-of-maxes — the algebraic-aggregate identity the
    * oracle checks against a from-scratch recompute). The derived mean
    * comes LAST, from the merged state (a mean is not mergeable; its
    * numerator and denominator are — the reason the summary stores
    * sums, not averages).
    */
  def mergeSummaries(
      summaries: Seq[DataFrame],
      keyCols: Seq[String]): DataFrame =
    summaries.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_micro").as("sum_micro"),
        min("min_micro").as("min_micro"), max("max_micro").as("max_micro"))
      .select(keyCols.map(col) ++ Seq(col("n"), col("sum_micro"),
        col("min_micro"), col("max_micro"),
        round(col("sum_micro").cast("double") / col("n"), 0).cast("long")
          .as("avg_micro")): _*)

  /** Fixed-bin micro histogram — the MERGEABLE quantile state: unlike
    * an exact quantile (which is not algebraic — the textbook reason
    * sketches exist), bin counts over a FIXED grid merge by addition,
    * so incremental maintenance needs only the delta batch
    * (the [[microSummary]] story, extended to distributions). Clamped
    * ends absorb out-of-range values.
    */
  def microHistogram(rows: DataFrame, valCol: String,
      nBins: Int, loMicro: Long, widthMicro: Long): DataFrame =
    rows.select(least(greatest(
        floor((round(col(valCol) * 1e6, 0).cast("long") - loMicro)
          .cast("double") / widthMicro).cast("long"),
        lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** Merge histograms (Σ per bin) and read quantiles off the merged
    * state: for each requested permille q, the first bin whose
    * cumulative count reaches rank ⌈q·n/1000⌉ (ceil in exact integer
    * arithmetic), reported with its lower edge — a wholly integer
    * surface, so the merge ≡ recompute identity hash-checks like the
    * summary one. Grid resolution is the caller's accuracy knob, the
    * fixed-bin analog of a t-digest's compression parameter.
    *
    * Returns (q_permille, bin, edge_micro, cum_n).
    */
  def mergeHistogramQuantiles(hists: Seq[DataFrame],
      quantilesPermille: Seq[Int], loMicro: Long,
      widthMicro: Long): DataFrame = {
    val merged = hists.reduce(_ unionByName _)
      .groupBy("bin").agg(sum("n").as("n"))
    val cum = merged.select(col("bin"), col("n"),
      sum("n").over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum_n"))
    val total = merged.agg(sum("n").as("total"))
    val qs = merged.sparkSession
      .createDataFrame(quantilesPermille.map(Tuple1(_)))
      .toDF("q_permille")
    qs.crossJoin(broadcast(total))
      .crossJoin(broadcast(cum))
      // rank = ceil(q·n/1000) in exact integers ((q·n + 999) div 1000
      // — `div`, not `/`, which would detour through doubles)
      .filter(col("cum_n") >= expr("(q_permille * total + 999) div 1000"))
      .groupBy("q_permille")
      .agg(min("bin").as("bin"))
      .join(cum, Seq("bin"))
      .select(col("q_permille").cast("long").as("q_permille"), col("bin"),
        (lit(loMicro) + col("bin") * widthMicro).as("edge_micro"),
        col("cum_n"))
  }

  /** Snapshot reconciliation — the data-diff report between two
    * keyed states: rows added / removed / changed / unchanged, plus a
    * per-column changed count (null-safe compares), in ONE full-outer
    * join and one aggregation. The audit a CDC pipeline runs to prove
    * "apply(changes, v1) really equals v2" — and the generic
    * two-snapshot diff when no change log exists at all.
    * Returns one row: (n_v1, n_v2, n_added, n_removed, n_changed,
    * n_unchanged, changed_<col>…).
    */
  def reconcile(
      v1: DataFrame,
      v2: DataFrame,
      key: String,
      cols: Seq[String]): DataFrame = {
    val a = v1.select((key +: cols).map(c => col(c).as(s"a_$c")): _*)
    val b = v2.select((key +: cols).map(c => col(c).as(s"b_$c")): _*)
    val j = a.join(b, col(s"a_$key") === col(s"b_$key"), "full_outer")
    val inA = col(s"a_$key").isNotNull
    val inB = col(s"b_$key").isNotNull
    val anyChange = cols
      .map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    val colCounts = cols.map(c =>
      sum(when(inA && inB && !(col(s"a_$c") <=> col(s"b_$c")), 1L)
        .otherwise(0L)).as(s"changed_$c"))
    j.agg(
      sum(when(inA, 1L).otherwise(0L)).as("n_v1"),
      (sum(when(inB, 1L).otherwise(0L)).as("n_v2") +:
        sum(when(!inA && inB, 1L).otherwise(0L)).as("n_added") +:
        sum(when(inA && !inB, 1L).otherwise(0L)).as("n_removed") +:
        sum(when(inA && inB && anyChange, 1L).otherwise(0L)).as("n_changed") +:
        sum(when(inA && inB && !anyChange, 1L).otherwise(0L))
          .as("n_unchanged") +:
        colCounts): _*)
  }

  /** Incremental JOIN-view maintenance — the delta-rule identity
    * (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB for append-only
    * deltas: the maintained view is the stored base join plus THREE
    * delta-sized terms — at 100 TB the base⋈base term is the already-
    * materialized view (it is recomputed here only so the oracle's
    * full-recompute equality PROVES the identity end to end), and each
    * delta term joins a small delta against one stored side, broadcast
    * when the delta fits. The join-view companion to [[microSummary]] +
    * [[mergeSummaries]]'s aggregate maintenance.
    *
    * Inputs must share `key`; columns are `a.*` ++ `b.*` minus the
    * duplicate key. Returns the maintained view rows.
    */
  def joinViewMerge(
      baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame,
      key: String): DataFrame =
    Seq(
      baseA.join(baseB, Seq(key)),
      deltaA.join(baseB, Seq(key)),
      baseA.join(deltaB, Seq(key)),
      deltaA.join(deltaB, Seq(key)))
      .reduce(_ unionByName _)
}
