package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** bm25TopKMaxScore's contract is EQUALITY with bm25TopK — pruning may
  * never change a row. Exercised where pruning triggers (a dominant
  * rare term), where it can't (uniform terms), and on real data.
  */
class MaxScoreSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def both(docs: Seq[(Long, String)], terms: Seq[String], k: Int) = {
    val df = docs.toDF("doc_id", "text")
    val a = RetrievalOps.bm25TopK(df, terms, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = RetrievalOps.bm25TopKMaxScore(df, terms, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    (a, b)
  }

  test("a dominant rare term prunes common-term-only docs, results identical") {
    // docs 1-2 carry the rare term; 3-20 carry only the stop-ish term —
    // θ from the rare docs exceeds UB(common), so E = {rare} and the
    // common-only docs are pruned whole. Top-k must not notice.
    val docs = Seq(
      (1L, "rare common filler one"),
      (2L, "rare other filler two")) ++
      (3L to 20L).map(i => (i, s"common pad$i pad$i pad$i"))
    val (a, b) = both(docs, Seq("rare", "common"), 2)
    assert(a == b)
    assert(a.map(_._1).toSet == Set(1L, 2L))
  }

  test("uniform terms (no safe threshold) degrade to the unpruned plan") {
    val docs = (1L to 6L).map(i => (i, s"alpha beta pad$i"))
    val (a, b) = both(docs, Seq("alpha", "beta"), 4)
    assert(a == b)
  }

  test("fewer candidates than k: θ undefined, still identical") {
    val docs = Seq((1L, "alpha x"), (2L, "beta y"), (3L, "z z"))
    val (a, b) = both(docs, Seq("alpha", "beta"), 5)
    assert(a == b)
    assert(a.size == 2)
  }

  test("real corpus: pruned equals unpruned on the oracle query's terms") {
    val docs = graft.etl.Ingest.table(spark, "/root/testdata/sf0.001",
      "documents")
    val a = RetrievalOps.bm25TopK(docs,
      graft.queries.PipelineQueries.Bm25Terms,
      graft.queries.PipelineQueries.Bm25K).collect().toSeq
    val b = RetrievalOps.bm25TopKMaxScore(docs,
      graft.queries.PipelineQueries.Bm25Terms,
      graft.queries.PipelineQueries.Bm25K).collect().toSeq
    assert(a == b)
  }
}
