package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The paraphrase-mining composition: embedding-near pairs verified
  * lexically — high cosine + low Jaccard = paraphrase, high cosine +
  * high Jaccard = plain near-dup.
  */
class ParaphraseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("high-cos/low-jaccard pairs flag as paraphrases; lexical near-dups do not") {
    // label 0: three colinear vectors (all pairs cos 1.0); label 1 never
    // pairs with them
    val emb = Seq(
      (0L, Array(1.0, 0.0), 0),
      (1L, Array(2.0, 0.0), 0),
      (3L, Array(4.0, 0.0), 0),
      (2L, Array(0.0, 1.0), 1)
    ).toDF("vec_id", "embedding", "label")
    // docs 0/1 share 2 of 4 distinct 3-shingles (jaccard 0.5); doc 3
    // shares none with either (jaccard 0.0 — the paraphrase signal)
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d f"),
      (3L, "x y z w q"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val pairs = SimilarityOps.nearDupPairs(SimilarityOps.withNorm(emb), 0.3)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cos_sim"))
    val sets = DedupOps.candidateShingleSets(pairs, docs)
    val out = pairs
      .join(DedupOps.ngramJaccardSets(pairs, sets), Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("cos_sim"), col("jaccard"),
        (col("jaccard") < 0.2).as("is_paraphrase"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(out((0L, 1L)) == ((1.0, 0.5, false))) // lexical near-dup
    assert(out((0L, 3L)) == ((1.0, 0.0, true))) // paraphrase-suspect
    assert(out((1L, 3L)) == ((1.0, 0.0, true)))
  }
}
