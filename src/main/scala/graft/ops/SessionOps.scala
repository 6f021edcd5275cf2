package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the events stream table — the batch
  * formulation of the session-window pattern (the streaming analog is
  * `flatMapGroupsWithState`, see graft.streaming). One shuffle on the
  * session key; everything after is window functions over the same
  * partitioning, so no second exchange.
  */
object SessionOps {

  val DefaultGapUs: Long = 30L * 60L * 1000000L

  /** Assign session ids: a session breaks when the gap to the previous
    * event exceeds `gapUs`. Input needs (user_id, ts_us, event_id).
    */
  def sessionized(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("prev_ts", lag("ts_us", 1).over(byTs))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "is_new")
  }

  /** Ordered funnel progression per key: the first time each stage of
    * `stages` is reached, where stage i+1 must occur STRICTLY AFTER the
    * event that satisfied stage i (a purchase before the first view is
    * not a converted funnel — the sequencing is the whole operator; a
    * per-stage min() would count it).
    *
    * Shape: ONE shuffle (the groupBy), then a linear fold over each
    * key's time-sorted events — `aggregate` over the collected list,
    * appending stage i's timestamp the first time its type shows up
    * after stage i−1's. Per-key collect_list is bounded by per-key
    * event counts (the r5_sorted_events caveat, documented there); the
    * alternative — one conditional-min aggregate + join PER STAGE —
    * costs `stages.length` shuffles of the full event table, which is
    * the wrong trade at 100 TB for the funnels that matter (3–7
    * stages).
    *
    * Unreached stages surface as −1 (hash-stable), `n_stages` counts
    * the reached prefix.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageLit = typedlit(stages)
    val folded = events
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_type"))))
        .as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"),
          lit(Array.empty[Long]),
          (acc, e) => {
            // try_element_at throughout: ANSI element_at throws on any
            // out-of-range index, and when()'s branches don't guard
            // subexpression evaluation — a completed funnel would probe
            // stages[n+1]
            val nxt = size(acc)
            val wanted = try_element_at(stageLit, nxt + 1)
            val inOrder = (nxt === 0) ||
              (e.getField("ts_us") > try_element_at(acc, nxt))
            when(nxt < stages.length && e.getField("event_type") === wanted
                && inOrder,
              concat(acc, array(e.getField("ts_us"))))
              .otherwise(acc)
          }).as("reached"))
    stages.indices.foldLeft(folded) { (d, i) =>
      d.withColumn(s"stage${i + 1}_us",
        coalesce(try_element_at(col("reached"), lit(i + 1)), lit(-1L)))
    }
      .withColumn("n_stages", size(col("reached")).cast("long"))
      .drop("reached")
  }

  /** Per-user session stats: count, total events, longest session. */
  def sessionStats(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame =
    sessionized(events, gapUs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("len_us"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("len_us").as("max_session_us"))
}
