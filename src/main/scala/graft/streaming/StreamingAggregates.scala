package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked streaming aggregations — the built-in Structured
  * Streaming surface (no custom state): tumbling event-time windows and
  * streaming exact dedup. State stores stay bounded because the
  * watermark lets Spark evict windows/keys older than the lateness
  * horizon — the knob that makes these run indefinitely on a cluster.
  */
object StreamingAggregates {

  /** Tumbling-window event counts/sums per type. Input needs an
    * event-time column `ets` (timestamp); late data beyond
    * `latenessSeconds` is dropped, completed windows emit once (append).
    */
  def windowedEventStats(
      events: DataFrame,
      windowSeconds: Int,
      latenessSeconds: Int
  ): DataFrame =
    events
      .withWatermark("ets", s"$latenessSeconds seconds")
      .groupBy(
        window(col("ets"), s"$windowSeconds seconds").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on a key (e.g. a content hash): first
    * occurrence passes, replays within the watermark horizon are
    * dropped, and state for keys older than the horizon is evicted.
    */
  def dedupStream(events: DataFrame, latenessSeconds: Int): DataFrame =
    events
      .withWatermark("ets", s"$latenessSeconds seconds")
      .dropDuplicatesWithinWatermark("dedup_key")
}
