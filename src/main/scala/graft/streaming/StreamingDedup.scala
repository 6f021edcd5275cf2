package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental analog of
  * [[graft.ops.DedupOps.exactGroups]] for a continuously-arriving
  * document stream (the ingestion edge of a training-data pipeline).
  *
  * Keyed on a content hash, NOT the raw text: dedup state then stores 32
  * bytes per seen document instead of the document itself. State is
  * bounded by the event-time watermark (`dropDuplicatesWithinWatermark`),
  * so a 100 TB/day stream holds `delay`-worth of hashes, not
  * forever-growing state — plain `dropDuplicates` on an unbounded stream
  * would OOM the state store. Duplicates farther apart than `delay` are
  * deliberately out of contract (they belong to the batch compaction
  * pass, ops/DedupOps).
  */
object StreamingDedup {

  /** First arrival per content hash within the watermark window.
    * `tsCol` must be a TimestampType event-time column.
    */
  def firstArrivals(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_md5")
}
