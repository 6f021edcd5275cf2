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
