package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.SimilarityOps

/** Streaming cross-corpus near-dup detection against a FROZEN slim LSH
  * index — the continuous form of `dedup_embedding_incremental` (the
  * ingestion edge of an embedding store: every arriving vector batch is
  * checked against the persisted corpus index before admission).
  *
  * Each micro-batch runs the full batch probe plan
  * ([[SimilarityOps.nearDupPairsLshCrossSlim]]) against the static
  * artifact pair via `foreachBatch` — the probe is a multi-shuffle plan
  * (bucket collect + candidate joins) that pure continuous streaming
  * cannot express, and it does not need to: the index is FROZEN, so
  * there is no cross-batch state to maintain.
  *
  * The correctness theorem this rides (spec-pinned): chunked probing ≡
  * one-shot probing. A batch vector's buckets depend only on itself and
  * the index's frozen width (`bits` rides the artifact), and the probe
  * emits CROSS-side pairs only — no batch×batch interaction — so
  * probing a stream chunk by chunk and unioning the outputs yields
  * exactly the pairs of probing the concatenated batch once. This is
  * the streaming restatement of the frozen-geometry contract ("growing
  * the batch never loses a pair", r12) and it is what makes the daily
  * increment safely restatable as an hourly or per-minute increment
  * without a semantic change.
  *
  * Scale shape: per micro-batch cost is one batch-side signing plus the
  * shared bucket shuffle against the artifact (never a raw-corpus
  * scan); state store holds NOTHING (the index lives as a table, not as
  * stream state — a 100 TB corpus index in the state store would be the
  * wrong tool). Exactly-once output is the sink's concern: pair rows
  * are deterministic per (index generation, vec_id), so an idempotent
  * (replay-safe) sink keyed on (existing_id, batch_id) absorbs
  * micro-batch replays, the StreamingSinks pattern.
  */
object StreamingIndexProbe {

  /** Probe each micro-batch of `newVectors` — (vec_id, embedding)
    * rows — against the frozen slim index, handing the per-batch pair
    * surface (existing_id, batch_id, cos_sim) to `emit`. The caller
    * starts the returned writer (choosing trigger/checkpoint), keeping
    * this module a pure plan factory like the other streaming twins.
    *
    * The artifact's frozen prefix width is read ONCE here, before the
    * writer exists (r15, advice): it is frozen for the stream's
    * lifetime, so each micro-batch's probe plan is built fully lazily
    * instead of re-running a driver limit(1) job per batch.
    */
  def probeEachBatch(newVectors: DataFrame,
      index: SimilarityOps.LshSlimIndex, threshold: Double)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val bits = SimilarityOps.slimIndexBits(index.entries)
    newVectors.writeStream.foreachBatch { (b: DataFrame, batchId: Long) =>
      emit(SimilarityOps.nearDupPairsLshCrossSlimAt(
        index.entries, index.vectors,
        SimilarityOps.withNorm(b.select("vec_id", "embedding")),
        threshold, bits), batchId)
    }
  }
}
