package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Sparse TF-IDF cosine join: identity pairs, max_df pruning as the
  * vector-space definition (not a lossy shortcut), and the no-all-pairs
  * plan property.
  */
class SparseCosineSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], maxDf: Long = 100L,
      minMicro: Long = 0L) =
    SimilarityOps.sparseCosinePairs(
      docs.toDF("doc_id", "text"), shingleK = 3, maxDf, minMicro)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("identical documents score exactly 1e6; disjoint ones never pair") {
    val out = run(Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "p q r s t")))
    assert(out == Map((1L, 2L) -> 1000000L))
  }

  test("a shingle above max_df is outside the vector space entirely") {
    // "x y z" appears in four of five docs; with maxDf=3 it is pruned,
    // so docs 3/4 (whose ONLY content is the stop-shingle) have no
    // vector and docs 1/2 pair only through their residual shingles.
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c"),
      (3L, "x y z"),
      (4L, "x y z"),
      (5L, "p q r"))
    val pruned = run(docs, maxDf = 3L)
    assert(pruned.keySet == Set((1L, 2L)))
    assert(pruned((1L, 2L)) == 1000000L)
    // without pruning the (df=4 < N) stop-shingle links everything
    val full = run(docs, maxDf = 100L)
    assert(full.keySet == Set(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(full((3L, 4L)) == 1000000L)
    assert(full((1L, 3L)) < 1000000L && full((1L, 3L)) > 0L)
  }

  test("an idf-zero shingle (df = N) is inert: no zero-norm divide") {
    // every doc contains "x y z" ⇒ idf 0 ⇒ weight 0 ⇒ dropped; docs
    // 3/4 then have no vector at all and the query still evaluates.
    val out = run(Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c"),
      (3L, "x y z"),
      (4L, "x y z")))
    assert(out == Map((1L, 2L) -> 1000000L))
  }

  test("partial overlap lands strictly between 0 and 1e6, symmetric cut") {
    // the third doc keeps the shared shingle's df below N (idf > 0)
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "m n o m n o"))
    val out = run(docs, minMicro = 1L)
    val v = out((1L, 2L))
    assert(v > 0L && v < 1000000L)
    // threshold at exactly the value keeps the pair; above drops it
    assert(run(docs, minMicro = v).contains((1L, 2L)))
    assert(!run(docs, minMicro = v + 1).contains((1L, 2L)))
  }

  test("plan has no cartesian/all-pairs join: pairs form on the shingle key") {
    val df = SimilarityOps.sparseCosinePairs(
      Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text"),
      3, 100L, 0L)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Cross") || plan.contains("n_docs"),
      "only the 1-row corpus-count dim may cross-join")
  }
}
