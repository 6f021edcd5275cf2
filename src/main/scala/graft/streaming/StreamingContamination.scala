package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming benchmark decontamination — the ingestion-edge analog of
  * [[graft.ops.DedupOps.contaminationCounts]]: documents arrive as a
  * stream, the benchmark/holdout gram set is a STATIC relation, and
  * every arriving doc is scored for eval overlap before it enters the
  * training corpus (the gate you want ON the ingest path — catching
  * contamination after pretraining data is frozen is too late).
  *
  * Execution shape: per-doc distinct k-shingles explode scan-side
  * (each doc arrives whole in one row, so the distinct is a per-row
  * `array_distinct` — no stateful dedup), then a stream-STATIC inner
  * equi-join against the benchmark grams — stateless by construction
  * (the static side is fixed; Spark broadcasts it per micro-batch) —
  * and a streaming count keyed on doc_id. The only state is the
  * per-doc counter; the benchmark side is tiny by nature (eval sets
  * are thousands of docs, the training stream is the 100 TB side).
  *
  * The shingle expression is shared with the batch operator
  * ([[TextOps.shingles]] at the same k), so the two paths cannot
  * drift — StreamingBatchEquivalenceSpec chains this to the
  * oracle-checked `dedup_contamination` query.
  */
object StreamingContamination {

  /** Per-doc contaminated-shingle counts over a (doc_id, text) stream
    * against a static (shingle) benchmark relation. Docs with zero
    * overlap produce no row, matching the batch inner-join contract.
    */
  def contaminationCounts(docStream: DataFrame, benchSh: DataFrame): DataFrame =
    docStream
      .select(col("doc_id"),
        explode(array_distinct(
          TextOps.shingles(TextOps.tokens(col("text"))))).as("shingle"))
      .join(benchSh.select(col("shingle")).distinct(), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
}
