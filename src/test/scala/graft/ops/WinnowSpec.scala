package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    TextOps.winnowFingerprints(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("toks")))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
      }

  test("the winnowing guarantee: a shared w+k-1 token run shares a fingerprint") {
    // k=3, w=4: any common run of 6 tokens must yield >= 1 common hash
    val shared = "alpha beta gamma delta epsilon zeta"
    val out = fps(Seq(
      (1L, s"one two three four $shared"),
      (2L, s"$shared nine ten eleven twelve")))
    val h1 = out(1L).map(_._2)
    val h2 = out(2L).map(_._2)
    assert((h1 & h2).nonEmpty)
  }

  test("rightmost-minimum tiebreak: a constant doc selects every window's last slot") {
    // all grams identical => every window's min is its rightmost element
    val n = 9 // 9 tokens, 7 grams, windows i = 1..4 select pos i+3
    val out = fps(Seq((1L, Seq.fill(n)("x").mkString(" "))))
    assert(out(1L).map(_._1) == Set(4L, 5L, 6L, 7L))
    assert(out(1L).map(_._2).size == 1)
  }

  test("documents shorter than w+k-1 tokens emit nothing") {
    val out = fps(Seq(
      (1L, "a b c d e"), // 5 tokens: 3 grams < w=4 windows
      (2L, "a b"),       // shorter than a gram
      (3L, "a b c d e f")))
    assert(!out.contains(1L) && !out.contains(2L))
    assert(out(3L).nonEmpty)
  }

  test("winnowCandidatePairs: shared runs pair, boilerplate df cap prunes") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (1L to 6L).map(i =>
      (i, s"u$i v$i w$i $shared x$i y$i z$i")) :+
      (9L, "lone words only here nothing shared at all")
    def pairs(maxDf: Long) = DedupOps.winnowCandidatePairs(
      TextOps.winnowFingerprints(
        docs.toDF("doc_id", "text")
          .select(col("doc_id"),
            org.apache.spark.sql.functions.split(col("text"), " ")
              .as("toks"))),
      minShared = 1L, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all six sharers pair with each other; the lone doc pairs with none
    val all = pairs(maxDf = 20L)
    assert(all == (for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)).toSet)
    // the df cap: six IDENTICAL docs select identical fingerprints
    // everywhere (df = 6 for every fp), so a cap below 6 prunes all
    // expansion. (The mixed corpus above is NOT fully prunable — near
    // the run boundaries winnowing selects different grams per doc, so
    // some shared fps have df 2: exactly the local-overlap sensitivity
    // the index exists for.)
    val identical = (1L to 6L).map(i => (i, shared + " " + shared))
    def identicalPairs(maxDf: Long) = DedupOps.winnowCandidatePairs(
      TextOps.winnowFingerprints(
        identical.toDF("doc_id", "text")
          .select(col("doc_id"),
            org.apache.spark.sql.functions.split(col("text"), " ")
              .as("toks"))),
      minShared = 1L, maxDf)
      .collect()
    assert(identicalPairs(maxDf = 20L).nonEmpty)
    assert(identicalPairs(maxDf = 5L).isEmpty)
  }

  test("selection density is the winnowing fraction, not all grams") {
    val words = (0 until 200).map(i => s"w$i")
    val out = fps(Seq((1L, words.mkString(" "))))
    val grams = 198
    // expected ~2/(w+1)=0.4 of grams; assert well under 1.0 and above 1/w
    assert(out(1L).size < grams * 3 / 4)
    assert(out(1L).size >= grams / 4)
  }
}
