package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** Hand-computed BPE chain. Corpus words: aaab ×3, ab ×1.
  *
  *  round 1: "a a" counts 2·3=6 (overlapping positions both count),
  *           beats "a b" (3+1=4) → merge "aa"; leftmost non-overlapping
  *           rewrite turns "a a a b" into "aa a b" (NOT "a aa b").
  *  round 2: "a b" (3+1=4) beats "aa a" (3) → merge "ab".
  *  round 3: "aa ab" (3) is all that's left of aaab → merge "aaab".
  */
class TokenizerOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("BPE merges: weighted overlapping counts, argmax ties, iterative rewrite") {
    import spark.implicits._
    val docs = Seq((0L, "aaab aaab ab"), (1L, "aaab")).toDF("doc_id", "text")
    val m = TokenizerOps.bpeMerges(docs, 3)
    assert(m == Seq(
      (1L, "a a", "aa", 6L),
      (2L, "a b", "ab", 4L),
      (3L, "aa ab", "aaab", 3L)))
    // exhausted vocab: asking for more merges than exist stops early
    val all = TokenizerOps.bpeMerges(docs, 10)
    assert(all.length == 3 && all == m)
    // single-char words have no pairs at all
    assert(TokenizerOps.bpeMerges(
      Seq((0L, "a b c")).toDF("doc_id", "text"), 2).isEmpty)
  }

  test("skip-gram pairs: window clipping, self-exclusion, deterministic negatives") {
    import spark.implicits._
    val docs = Seq((5L, "a b c d"), (6L, "x")).toDF("doc_id", "text")
    val out = TokenizerOps.skipgramPairs(docs, window = 2, negatives = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)) ->
        ((r.getString(1), r.getString(2), r.getSeq[String](5))))
      .toMap
    // doc 6 has one token: no pairs at all
    assert(out.keys.forall(_._1 == 5L))
    // "a b c d", window 2: boundary positions clip, center never pairs
    // with itself
    val posPairs = out.keys.collect { case (_, p, c) => (p, c) }.toSet
    assert(posPairs == Set(
      (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 2L), (4L, 3L)))
    assert(out((5L, 1L, 2L))._1 == "a" && out((5L, 1L, 2L))._2 == "b")
    // negatives: 2 per pair, drawn from the doc's own tokens, stable
    val negs = out((5L, 1L, 2L))._3
    assert(negs.length == 2 && negs.forall(Set("a", "b", "c", "d")))
    val again = TokenizerOps.skipgramPairs(docs, 2, 2).collect()
      .find(r => r.getLong(0) == 5L && r.getLong(3) == 1L && r.getLong(4) == 2L)
      .get.getSeq[String](5)
    assert(again == negs, "negative draw must be deterministic")
  }

  test("segmentStats applies merges in order: aaab collapses to ONE subword") {
    import spark.implicits._
    val docs = Seq((0L, "aaab aaab ab"), (1L, "aaab"), (2L, "xy")).toDF("doc_id", "text")
    val m = TokenizerOps.bpeMerges(docs.filter(col("doc_id") < 2), 3)
    val out = TokenizerOps.segmentStats(docs, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // merges (a a→aa, a b→ab, aa ab→aaab) fully cover both vocab words
    assert(out(0L) == (3L, 3L) && out(1L) == (1L, 1L))
    // an unseen word stays fully split: "x y" → 2 subwords
    assert(out(2L) == (1L, 2L))
    // no merges at all: every word splits to its characters
    val raw = TokenizerOps.segmentStats(docs, Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(0L) == 10L && raw(1L) == 4L && raw(2L) == 2L)
  }
}
