package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Unigram-LM tokenizer trainer (TokenizerOps.unigramTrain /
  * unigramSegmentStats): Viterbi optimality against brute-force
  * enumeration, the max-struct tie rule, coverage, prune bounds, and
  * partitioning-independence of the trained artifact.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** Brute-force best segmentation score: max over all segmentations of
    * `w` into vocab pieces of the summed scores (None if uncoverable).
    */
  private def brute(w: String, vmap: Map[String, Long], p: Int): Option[Long] =
    if (w.isEmpty) Some(0L)
    else (1 to math.min(p, w.length)).flatMap { l =>
      val piece = w.substring(0, l)
      vmap.get(piece).flatMap(s => brute(w.substring(l), vmap, p).map(_ + s))
    } match {
      case xs if xs.isEmpty => None
      case xs => Some(xs.max)
    }

  test("viterbiDp matches brute-force enumeration on every corpus word") {
    val vmap = Map("a" -> -5L, "b" -> -7L, "c" -> -6L, "ab" -> -9L,
      "bc" -> -8L, "abc" -> -20L, "cab" -> -11L)
    val words = Seq("abc", "ab", "cab", "abcab", "bcbc", "a", "ccc")
    val lit = typedlit(vmap)
    val got = words.toDF("w")
      .select(col("w"),
        TokenizerOps.viterbiDp(col("w"), lit, 3, 8).as("dp"))
      .select(col("w"), element_at(col("dp"), length(col("w")) + 1)("s"))
      .as[(String, Long)].collect().toMap
    words.foreach { w =>
      assert(got(w) == brute(w, vmap, 3).get, s"word $w")
    }
  }

  test("viterbi tie rule: equal score resolves to the LONGER piece") {
    // "ab" as one piece scores -10; "a"+"b" also -10. max(struct(s, l))
    // must pick l=2 — the same lexicographic struct max the DuckDB
    // oracle's struct_pack comparison applies.
    val vmap = Map("a" -> -4L, "b" -> -6L, "ab" -> -10L)
    val pieces = Seq("ab").toDF("w")
      .select(col("w"),
        TokenizerOps.viterbiDp(col("w"), typedlit(vmap), 2, 4).as("dp"))
      .select(TokenizerOps.viterbiPieces(col("w"), col("dp"), 4))
      .as[Seq[String]].head()
    assert(pieces == Seq("ab"), s"longest piece must win the tie: $pieces")
  }

  test("viterbiPieces reconstructs a segmentation that sums to the dp score") {
    val vmap = Map("x" -> -3L, "y" -> -4L, "xy" -> -6L, "yx" -> -5L)
    val rows = Seq("xyxyx", "yyx", "x").toDF("w")
      .select(col("w"),
        TokenizerOps.viterbiDp(col("w"), typedlit(vmap), 2, 8).as("dp"))
      .select(col("w"),
        element_at(col("dp"), length(col("w")) + 1)("s"),
        TokenizerOps.viterbiPieces(col("w"), col("dp"), 8))
      .as[(String, Long, Seq[String])].collect()
    rows.foreach { case (w, s, pieces) =>
      assert(pieces.mkString == w, s"pieces must tile the word: $w $pieces")
      assert(pieces.map(vmap).sum == s, s"piece scores must sum to dp: $w")
    }
  }

  test("training: coverage, prune bound, determinism, partition-independence") {
    val d = docs("the cat sat", "the cat ran", "a cat sat on the mat",
      "the the the", "mat cat bat")
    val v1 = TokenizerOps.unigramTrain(d, 3, 10, 5, 2, 8)
    val chars = d.collect().flatMap(_.getString(1).split(" "))
      .filter(_.nonEmpty).flatMap(_.toCharArray).map(_.toString).toSet
    val pieces = v1.map(_._1).toSet
    assert(chars.subsetOf(pieces), "every corpus char must stay in the vocab")
    assert(v1.count(_._1.length > 1) <= 5, "multi-char vocab obeys finalK")
    assert(v1.map(_._1).distinct.size == v1.size, "no duplicate pieces")
    // scores are negative log-probs in micro units
    assert(v1.forall(_._3 < 0L), "smoothed log-probs are strictly negative")
    val v2 = TokenizerOps.unigramTrain(d.repartition(7), 3, 10, 5, 2, 8)
    assert(v1 == v2, "trained vocab must not depend on partitioning")
  }

  test("segment stats: bounds, exact nll, and the char-fallback branch") {
    val d = docs("aa ab ba", "abababab aa", "b")
    val vocab = TokenizerOps.unigramTrain(d, 2, 8, 4, 1, 4)
    val vmap = vocab.map(t => t._1 -> t._3).toMap
    // maxWordLen=4 forces "abababab" (len 8) onto the char-fallback path
    val rows = TokenizerOps.unigramSegmentStats(d, vocab, 2, 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    rows.foreach { case (_, nw, np, nll) =>
      assert(np >= nw, "at least one piece per word")
      assert(nll > 0L, "nll is a positive integer micro unit")
    }
    // doc 1: "abababab" → 8 char pieces (fallback), "aa" → best seg
    val (_, nw1, np1, nll1) = rows(1)
    assert(nw1 == 2L)
    val aaBest = brute("aa", vmap, 2).get
    val fallbackNll = -(vmap("a") * 4 + vmap("b") * 4)
    // "aa" takes whichever segmentation scores best (1 or 2 pieces —
    // smoothing can make "a"+"a" beat the "aa" piece), chars fallback is
    // exactly 8
    assert(np1 == 9L || np1 == 10L, s"np: $np1")
    assert(nll1 == fallbackNll - aaBest,
      s"nll must be the exact integer sum: $nll1")
  }
}
