package graft.ops

import org.scalatest.funsuite.AnyFunSuite
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
}
