package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs, equal lengths (dl terms cancel): "rare" appears in one doc,
  // "common" in three — idf separates them.
  lazy val docs = Seq(
    (1L, "rare x y z"),
    (2L, "common x y z"),
    (3L, "common common y z"),
    (4L, "common a b c")
  ).toDF("doc_id", "text")

  test("bm25: rare terms outrank common ones; tf raises within a term; no-hit docs absent") {
    val out = RetrievalOps.bm25TopK(docs, Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rankOf = out.map(r => r._1 -> r._2).toMap
    // doc 1 holds the df=1 term — highest idf wins at equal tf and dl
    assert(rankOf(1L) == 1L, out.toSeq)
    // within 'common' (same idf): tf=2 (doc 3) above tf=1 (docs 2, 4)
    assert(rankOf(3L) < rankOf(2L) && rankOf(3L) < rankOf(4L))
    // equal scores tie-break by doc_id, and docs without any query term
    // never appear
    assert(rankOf(2L) < rankOf(4L))
    assert(out.length == 4)
    // k truncates the ranked list
    assert(RetrievalOps.bm25TopK(docs, Seq("common"), k = 2).count() == 2)
  }

  test("rrf fuses by rank only; presence in both lists compounds") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((10L, 2L), (13L, 1L)).toDF("doc_id", "rank")
    val out = RetrievalOps.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 10: 1/61 + 1/62 beats doc 13's single 1/61
    assert(out.head._1 == 10L && out.head._3 == 2L)
    assert(out.head._2 == BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // singles ordered by their one rank, ties by doc_id
    assert(out.map(_._1).toSeq == Seq(10L, 13L, 11L, 12L))
  }
}
