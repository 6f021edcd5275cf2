package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-axis recall-targeting twin (DedupOps.minhashPairsAtRecall):
  * calibrate at `calibBands` against exact stripe-Jaccard truth → solve
  * 1−(1−x)^b ≥ target in floor-micro integers → rebuild at the solved
  * band count → report MEASURED recall; raise by name when the band
  * ceiling cannot reach the target or the stripe has no truth. The
  * oracle row (`dedup_minhash_auto_recall`) pins the cross-engine
  * decision replay on the real corpus (whose dup profile is near-exact,
  * so it exercises the calibration-suffices short-circuit); this spec
  * pins the escalation and raise paths on corpora with CONTROLLED
  * mid-Jaccard dup structure the real corpus has none of.
  */
class MinhashAtRecallSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def sfDocs(sf: String): DataFrame =
    graft.etl.Ingest.table(spark, s"/root/testdata/$sf", "documents")

  /** `nPairs` doc pairs at an EXACT target Jaccard: each pair shares a
    * contiguous `m`-token prefix and differs in its suffix, all tokens
    * unique within a doc and disjoint across pairs — so shingle overlap
    * is exactly m−2 of (tokens−2) per doc and cross-pair Jaccard is 0.
    * Base ids 0..nPairs−1 (the calibration stripe), partners at 1000+i.
    */
  private def pairedDocs(nPairs: Int, sharedTokens: Int,
      suffixTokens: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until nPairs).flatMap { i =>
      val prefix = (0 until sharedTokens).map(j => s"p${i}s$j")
      def doc(side: String) =
        (prefix ++ (0 until suffixTokens).map(j => s"p$i$side$j"))
          .mkString(" ")
      Seq((i.toLong, doc("a")), (1000L + i, doc("b")))
    }
    rows.toDF("doc_id", "text")
  }

  test("calibration pass meeting the target IS the answer (b = calibBands)") {
    // the real corpus's dups are near-exact (stripe truth all >= 0.9
    // Jaccard), so 4 bands of width 2 already catch ~everything
    val r = DedupOps.minhashPairsAtRecall(
      sfDocs("sf0.001"), threshold = 0.5, targetRecall = 0.9)
    assert(r.bands == DedupOps.Bands, r.toString)
    assert(r.calibRecallMicro == r.achievedRecallMicro, r.toString)
    assert(r.achievedRecallMicro >= r.targetMicro, r.toString)
    assert(r.pairs.count() > 0)
  }

  test("escalation: solved b is a multiple of calibBands and achieves the target") {
    // Jaccard 0.6 pairs: per-band collision ~ 0.6^2 = 0.36, so 4 bands
    // predict ~0.83 recall — a 0.9 target must escalate (to ~8 bands,
    // where the predicted catch is ~0.97)
    val docs = pairedDocs(30, sharedTokens = 32, suffixTokens = 10)
    val r = DedupOps.minhashPairsAtRecall(
      docs, threshold = 0.5, targetRecall = 0.9, calibQueries = 30)
    assert(r.bands > r.calibBands && r.bands % r.calibBands == 0, r.toString)
    assert(r.calibRecallMicro < r.targetMicro,
      s"expected the calibration pass to MISS the target: $r")
    assert(r.achievedRecallMicro >= r.targetMicro,
      s"solved band count did not achieve the target: $r")
    assert(r.nTrue == 30, r.toString)
  }

  test("unreachable target raises BY NAME with the measured geometry") {
    // Jaccard 0.2 pairs: per-band collision ~ 0.04; even 32 bands
    // predict only ~0.73 recall, so 0.999 is infeasible
    val docs = pairedDocs(30, sharedTokens = 16, suffixTokens = 28)
    val e = intercept[IllegalArgumentException] {
      DedupOps.minhashPairsAtRecall(
        docs, threshold = 0.15, targetRecall = 0.999, calibQueries = 30)
    }
    assert(e.getMessage.contains("UNREACHABLE"), e.getMessage)
    assert(e.getMessage.contains("32-band ceiling"), e.getMessage)
  }

  test("a truthless calibration stripe raises BY NAME, not 0/0") {
    val docs = pairedDocs(10, sharedTokens = 32, suffixTokens = 10)
    val e = intercept[IllegalArgumentException] {
      DedupOps.minhashPairsAtRecall(
        docs, threshold = 0.99, targetRecall = 0.9, calibQueries = 10)
    }
    assert(e.getMessage.contains("NO true"), e.getMessage)
  }

  test("target 1.0, bad band counts, and unpackable lane widths are rejected") {
    val docs = pairedDocs(4, sharedTokens = 32, suffixTokens = 10)
    intercept[IllegalArgumentException] {
      DedupOps.minhashPairsAtRecall(docs, 0.5, targetRecall = 1.0)
    }
    intercept[IllegalArgumentException] {
      DedupOps.minhashPairsAtRecall(docs, 0.5, 0.9, calibBands = 40)
    }
    // 3 bands × 2 rows = 6 lanes does not pack into 4-lane md5 digests
    intercept[IllegalArgumentException] {
      DedupOps.minhashSignatureAt(DedupOps.shingled(docs), 3)
    }
  }

  test("band keys are bit-identical across signature widths (the min_b contract)") {
    val sh = DedupOps.shingled(sfDocs("sf0.001")).cache()
    val narrow = DedupOps.minhashSignature(sh)
    val wide = DedupOps.minhashSignatureAt(sh, 8)
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"))
    assert(narrow.exceptAll(wide).isEmpty && wide.exceptAll(narrow).isEmpty)
    sh.unpersist()
  }
}
