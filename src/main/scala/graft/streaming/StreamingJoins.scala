package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state.
  *
  * The reference is batch-only (SURVEY.md §2g), but its event-sourced
  * model (K3) has a natural streaming analog: correlating two live event
  * streams — e.g. matching each VM action to the billing-window events it
  * triggers, or clickstream attribution. Spark buffers BOTH sides in
  * state; the watermark plus a time-range join condition is what lets it
  * evict — without them the state grows unboundedly, which is the failure
  * mode at production scale.
  */
object StreamingJoins {

  /** Inner join of two streams on `key` where the right event lands
    * within `[leftTs, leftTs + windowSec]` of the left event.
    *
    * Both sides are watermarked with `delay`, and the join condition
    * bounds `rightTs` relative to `leftTs` from BOTH sides — Spark
    * derives each side's state-eviction watermark from exactly this
    * range, so state per key is O(events within window + delay), not
    * O(stream length). Columns: left must carry (`key`, `leftTs`),
    * right (`key`, `rightTs`); all other columns pass through.
    */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      windowSec: Long,
      delay: String = "10 minutes"
  ): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSec SECONDS"),
      "inner")
      .drop(r(key))
  }
}
