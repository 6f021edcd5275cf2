package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nprobe-axis recall-targeting operator
  * (SimilarityOps.ivfTopKAtRecall): one probe-rank-tagged candidate
  * pass contains the whole recall-vs-nprobe frontier, the solver picks
  * the smallest nprobe meeting the target, and the served top-k is the
  * already-scanned slice. The oracle row (`sim_ivf_auto_recall`) pins
  * the cross-engine decision replay; this spec pins the serving
  * equivalence and the raise paths.
  */
class IvfAtRecallSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(sf: String): DataFrame =
    SimilarityOps.withNorm(graft.etl.Ingest
      .table(spark, s"/root/testdata/$sf", "embeddings")
      .select(col("vec_id"), col("embedding")))

  private lazy val corpus = emb("sf0.01")
  private lazy val queries = corpus.filter(col("vec_id") < 20)
  private lazy val cents = SimilarityOps.kmeansCentroids(
    graft.etl.Ingest.table(spark, "/root/testdata/sf0.01", "embeddings"),
    8, 2)

  test("solved nprobe meets the target and the served slice IS ivfTopKMultiProbe at it") {
    val r = SimilarityOps.ivfTopKAtRecall(
      corpus, queries, cents, k = 5, targetRecall = 0.9, maxProbe = 8)
    assert(r.recallAtMicro(r.nprobe - 1) >= r.targetMicro, r.recallAtMicro)
    if (r.nprobe > 1)
      assert(r.recallAtMicro(r.nprobe - 2) < r.targetMicro,
        s"not the SMALLEST nprobe: ${r.recallAtMicro}")
    // serving equivalence: the tagged slice at the solved p returns the
    // same rows as a direct multi-probe run at nprobe = p
    val direct = SimilarityOps.ivfTopKMultiProbe(
      corpus, queries, cents, 5, r.nprobe)
    assert(r.results.exceptAll(direct).isEmpty &&
      direct.exceptAll(r.results).isEmpty)
  }

  test("the frontier is monotone and hits 1.0 at nprobe = the cell count") {
    val r = SimilarityOps.ivfTopKAtRecall(
      corpus, queries, cents, k = 5, targetRecall = 1.0, maxProbe = 8)
    assert(r.recallAtMicro.sliding(2).forall(w => w(0) <= w(1)),
      r.recallAtMicro)
    assert(r.recallAtMicro.last == 1000000L,
      s"probing every cell must be exhaustive: ${r.recallAtMicro}")
    assert(r.nprobe <= 8)
  }

  test("unreachable target at a small probe ceiling raises BY NAME") {
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.ivfTopKAtRecall(
        corpus, queries, cents, k = 5, targetRecall = 0.999, maxProbe = 1)
    }
    assert(e.getMessage.contains("UNREACHABLE"), e.getMessage)
    assert(e.getMessage.contains("1-probe ceiling"), e.getMessage)
    assert(e.getMessage.contains("1.0 by construction"), e.getMessage)
  }

  test("an empty query set raises BY NAME, not 0/0") {
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.ivfTopKAtRecall(
        corpus, corpus.filter(col("vec_id") < 0), cents, 5, 0.9, 8)
    }
    assert(e.getMessage.contains("NO brute-force truth"), e.getMessage)
  }

  test("truth-side work is STRIPE-bounded; the full query set is still served") {
    // r12 verdict item 3: the truth pass must cost O(|corpus|·stripe),
    // not O(|corpus|·|Q|) — the cost the index exists to avoid
    val manyQueries = corpus.filter(col("vec_id") < 200)
    val r = SimilarityOps.ivfTopKAtRecall(
      corpus, manyQueries, cents, k = 5, targetRecall = 0.9, maxProbe = 8,
      calibQueries = 10)
    assert(r.nTrue <= 10L * 5,
      s"truth must come from the 10-query stripe alone, got ${r.nTrue} rows")
    val served = r.results.select("query_id").distinct().count()
    assert(served > 10,
      s"queries OUTSIDE the stripe must still be served, got $served ids")
    // the stripe decision serves the stripe itself identically to a
    // stripe-only run (the frontier is measured on the same rows)
    val striped = SimilarityOps.ivfTopKAtRecall(
      corpus, corpus.filter(col("vec_id") < 10), cents, 5, 0.9, 8,
      calibQueries = 10)
    assert(striped.nprobe == r.nprobe && striped.nTrue == r.nTrue)
    r.release(); striped.release()
  }

  test("release() unpersists the pinned candidate frame") {
    val r = SimilarityOps.ivfTopKAtRecall(
      corpus, queries, cents, k = 5, targetRecall = 0.9, maxProbe = 8)
    assert(r.pinned.nonEmpty)
    assert(r.pinned.forall(_.storageLevel.useMemory),
      "the backing candidate frame is returned cached")
    r.release()
    assert(r.pinned.forall(!_.storageLevel.useMemory),
      "release() must unpersist the backing blocks")
  }

  test("out-of-range target and probe ceilings are rejected by require") {
    intercept[IllegalArgumentException] {
      SimilarityOps.ivfTopKAtRecall(corpus, queries, cents, 5, 0.4, 8)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.ivfTopKAtRecall(corpus, queries, cents, 5, 0.9,
        maxProbe = cents.size + 1)
    }
  }
}
