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

  test("BPE merges: pairs with backslashes survive the rewrite (bound literals, not SQL text)") {
    import spark.implicits._
    // tokens split on space, so "a\" is a legal 2-char word; the learned
    // pair "a \" and merged "a\" would mis-parse as interpolated SQL
    // string literals (backslash is an escape there)
    val docs = Seq((0L, "a\\ a\\ b")).toDF("doc_id", "text")
    val m = TokenizerOps.bpeMerges(docs, 3)
    assert(m == Seq((1L, "a \\", "a\\", 2L)))
    val stats = TokenizerOps.segmentStats(docs, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(0L) == (3L, 3L)) // both "a\" words collapse to one subword
  }

  test("BPE lineage bound: checkpointing keeps the plan O(checkpointEvery), chain unchanged") {
    import spark.implicits._
    // 62 distinct chars -> 61 distinct starting pairs; merges mint new
    // pairs, so 64 rounds all find work. Counts are all equal: the
    // pair-asc tie rule makes the chain deterministic either way.
    val word = (('a' to 'z') ++ ('0' to '9') ++ ('A' to 'Z')).mkString
    // two distinct words: each yields 61 sequential merges, so 64
    // rounds never exhaust the vocab
    val docs = Seq((0L, s"$word ${word.reverse}"), (1L, word)).toDF("doc_id", "text")
    val (chunked, chunkedMax) = TokenizerOps.bpeMergesTracked(docs, 64, checkpointEvery = 8)
    val (flat, flatMax) = TokenizerOps.bpeMergesTracked(docs, 64, checkpointEvery = 1000)
    assert(chunked == flat, "checkpointing must not alter the merge chain")
    assert(chunked.length == 64)
    assert(chunkedMax < flatMax,
      s"chunked plan ($chunkedMax nodes) should be smaller than unchunked ($flatMax)")
    assert(chunkedMax <= 30, s"chunked plan grew to $chunkedMax nodes")
    assert(flatMax > 40, s"unchunked control should grow linearly, saw $flatMax")
  }

  test("skip-gram pairs: negatives = 0 yields an empty array, not sequence(0,-1) garbage") {
    import spark.implicits._
    val docs = Seq((5L, "a b c")).toDF("doc_id", "text")
    val out = TokenizerOps.skipgramPairs(docs, window = 1, negatives = 0)
    assert(out.schema("neg_samples").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[String](5).isEmpty))
    assertThrows[IllegalArgumentException] {
      TokenizerOps.skipgramPairs(docs, window = 1, negatives = -1)
    }
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

  test("bigramPmi: hand-computed marginals, minCount prune, short docs contribute nothing") {
    import spark.implicits._
    // bigrams: doc 0 → (a,b), (b,a), (a,b); doc 1 → (a,c); doc 2 → none
    val docs = Seq((0L, "a b a b"), (1L, "a c"), (2L, "z"))
      .toDF("doc_id", "text")
    val all = TokenizerOps.bigramPmi(docs, minCount = 1L)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // totals: 4 bigrams; left a=3, b=1; right b=2, a=1, c=1
    assert(all.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(all(("a", "b")) == ((2L, 0.287682))) // ln(2·4 / (3·2))
    assert(all(("b", "a")) == ((1L, 1.386294))) // ln(1·4 / (1·1))
    assert(all(("a", "c")) == ((1L, 0.287682))) // ln(1·4 / (3·1))
    // minCount prunes the hapax tail before the join
    val pruned = TokenizerOps.bigramPmi(docs, minCount = 2L).collect()
    assert(pruned.length == 1 && pruned(0).getString(0) == "a"
      && pruned(0).getString(1) == "b")
  }

  test("fertilityBySource: per-source subwords/word under hand merges, floored micro") {
    import spark.implicits._
    val merges = Seq((1L, "a b", "ab", 9L)) // only 'a b' fuses
    val docs = Seq(
      (0L, "ab ab", "s1"),   // each word → "a b" → "ab": 1 subword
      (1L, "cd", "s2"),      // "c d" stays split: 2 subwords
      (2L, "ab cd x", "s2")  // 1 + 2 + 1 = 4 subwords over 3 words
    ).toDF("doc_id", "text", "source")
    val out = TokenizerOps.fertilityBySource(docs, merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s1") == ((2L, 2L, 1000000L)))
    // s2: 4 words, 6 subwords → floor(6e6/4) = 1500000
    assert(out("s2") == ((4L, 6L, 1500000L)))
  }

  test("wordpieceStats: greedy longest match, UNK on no-match and overlong words") {
    import spark.implicits._
    val vocab = Seq("a", "ab", "abc", "c", "##c", "##ab")
    // abc -> [abc] (longest wins over a/ab); aba -> ab + ##a missing -> UNK;
    // cab -> c + ##ab; x -> UNK; 17 chars -> UNK by the max-word rule
    val docs = Seq((1L, "abc aba cab x " + "a" * 17)).toDF("doc_id", "text")
    val r = TokenizerOps.wordpieceStats(docs, vocab,
      maxPieceLen = 3, maxWordLen = 16).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((5L, 6L, 3L)))
  }

  test("wordpieceStats: continuation pieces differ from initial pieces") {
    import spark.implicits._
    // "##c" present but "c" absent: word "c" is UNK while "ac" segments
    val vocab = Seq("a", "##c")
    val docs = Seq((1L, "c ac")).toDF("doc_id", "text")
    val r = TokenizerOps.wordpieceStats(docs, vocab, 2, 16).collect().head
    // c -> UNK (1 piece); ac -> a + ##c (2 pieces)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 3L, 1L)))
  }
}
