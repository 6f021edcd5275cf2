package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming → batch-sink bridging with replay safety.
  *
  * `foreachBatch` is the operational workhorse for sinks Structured
  * Streaming doesn't speak natively (JDBC, MERGE targets, multi-table
  * fan-out). Its contract: after a failure the SAME micro-batch can be
  * re-delivered with the SAME batchId — the sink function must be
  * idempotent per batchId or the pipeline duplicates data on recovery.
  */
object StreamingSinks {

  /** Partition-per-batch parquet sink: each micro-batch overwrites ITS
    * OWN `batch_id=<id>` directory (dynamic partition overwrite), so a
    * replayed batch replaces itself instead of appending twice —
    * exactly-once-per-batch effect on top of at-least-once delivery.
    */
  /** The per-batch write — public so a replayed delivery is literally
    * re-invoking this with the same batchId (which is what the harness's
    * replay test does).
    */
  def writeBatch(batch: DataFrame, batchId: Long, path: String): Unit = {
    batch.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .partitionBy("batch_id")
      .parquet(path)
  }

  def idempotentParquetSink[T](
      stream: Dataset[T],
      path: String): DataStreamWriter[T] =
    stream.writeStream.foreachBatch { (batch: Dataset[T], batchId: Long) =>
      writeBatch(batch.toDF(), batchId, path)
    }
}
