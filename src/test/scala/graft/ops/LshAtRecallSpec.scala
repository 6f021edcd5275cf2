package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The recall-targeting auto-L LSH operator: calibrate → solve
  * 1−(1−x)^L ≥ target with integer micro arithmetic → rebuild at the
  * solved L → report MEASURED recall; raise by name when the ceiling
  * cannot reach the target or when the stripe has no truth. The oracle
  * row (`dedup_lsh_auto_recall`) pins the cross-engine decision replay;
  * this spec pins the operator's contract on corpora the oracle corpus
  * does not exercise.
  */
class LshAtRecallSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def sfEmb(sf: String): DataFrame =
    SimilarityOps.withNorm(graft.etl.Ingest
      .table(spark, s"/root/testdata/$sf", "embeddings")
      .select(col("vec_id"), col("embedding")))

  /** Deterministic pseudo-random corpus with NO real cluster structure:
    * component (i, d) = frac(sin-free integer hash)/scale − 0.5, so at a
    * very low threshold the truth set is dominated by near-orthogonal
    * pairs — sign-LSH's hardest regime, where the 32-table ceiling
    * genuinely cannot hold a high recall target.
    */
  private def randomEmb(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    // splitmix64 finalizer: a LINEAR formula mod k would make every
    // pair differ by a constant component shift (near-dups everywhere)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = (0 until n).map { i =>
      (i.toLong, (0 until dim).map { d =>
        (Math.floorMod(mix(i.toLong * 4099L + d), 1000L).toDouble
          / 1000.0) - 0.5
      }.toArray)
    }
    SimilarityOps.withNorm(rows.toDF("vec_id", "embedding"))
  }

  test("calibration pass meeting the target IS the answer (L = calibTables)") {
    val r = SimilarityOps.nearDupPairsLshAtRecall(
      sfEmb("sf0.001"), 0.3, targetRecall = 0.5, calibQueries = 20)
    assert(r.tables == SimilarityOps.LshTables, r.toString)
    assert(r.calibRecallMicro == r.achievedRecallMicro, r.toString)
    assert(r.achievedRecallMicro >= r.targetMicro, r.toString)
    assert(r.pairs.count() > 0)
  }

  test("escalation: solved L is a multiple of calibTables and achieves the target") {
    // sf0.01 at threshold 0.3: measured calibration recall ≈ 0.9887 at
    // 8 tables, so a 0.99 target must escalate — the oracle-pinned path
    val r = SimilarityOps.nearDupPairsLshAtRecall(
      sfEmb("sf0.01"), 0.3, targetRecall = 0.99, calibQueries = 20)
    assert(r.tables > r.calibTables && r.tables % r.calibTables == 0,
      r.toString)
    assert(r.calibRecallMicro < r.targetMicro,
      s"expected the calibration pass to MISS the target: $r")
    assert(r.achievedRecallMicro >= r.targetMicro,
      s"solved L did not achieve the target: $r")
    // the escalated surface is a superset-or-equal pair count of any
    // smaller-L slice — sanity that more tables only ADD pairs
    assert(r.pairs.count() > 0)
  }

  test("unreachable target raises BY NAME with the measured geometry") {
    // n = 2000 → a 6-bit prefix; threshold 0.0 on structureless data
    // makes the truth set mostly near-orthogonal pairs, whose per-table
    // collision is far too low for 32 tables to reach 0.999
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshAtRecall(
        randomEmb(2000, 32), threshold = 0.0, targetRecall = 0.999,
        calibQueries = 30)
    }
    assert(e.getMessage.contains("UNREACHABLE"), e.getMessage)
    assert(e.getMessage.contains("32-table ceiling"), e.getMessage)
  }

  test("a truthless calibration stripe raises BY NAME, not 0/0") {
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshAtRecall(
        randomEmb(200, 32), threshold = 0.999999, targetRecall = 0.9,
        calibQueries = 10)
    }
    assert(e.getMessage.contains("NO true"), e.getMessage)
  }

  test("target 1.0 and over-POOL table counts are rejected by require") {
    val emb = randomEmb(50, 8)
    intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshAtRecall(emb, 0.3, targetRecall = 1.0)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshAtRecall(emb, 0.3, 0.9,
        maxTables = SimilarityOps.LshWideMaxTables + 1)
    }
  }

  test("a target reachable only ABOVE the 32-table default solves via the wide pool") {
    // deterministic in-spec corpus (the mix() generator above): measured
    // calibration recall at 8 tables is 0.742184, so the floor-micro
    // schedule predicts 0.995583 at 32 tables and 0.999981 at 64 — a
    // 0.999 target is UNREACHABLE at the default ceiling and solvable
    // within the wide hyperplane pool (r12 verdict item 4: the raise
    // used to name an L the engine could not execute)
    def corpus = randomEmb(2000, 32)
    val raised = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshAtRecall(
        corpus, 0.2, targetRecall = 0.999, calibQueries = 30)
    }
    assert(raised.getMessage.contains("UNREACHABLE"), raised.getMessage)
    assert(raised.getMessage.contains(
      s"up to ${SimilarityOps.LshWideMaxTables} via the wide pool"),
      raised.getMessage)
    val r = SimilarityOps.nearDupPairsLshAtRecall(
      corpus, 0.2, targetRecall = 0.999, calibQueries = 30,
      maxTables = SimilarityOps.LshWideMaxTables)
    assert(r.tables > SimilarityOps.LshAutoMaxTables &&
      r.tables <= SimilarityOps.LshWideMaxTables &&
      r.tables % r.calibTables == 0, r.toString)
    assert(r.pairs.count() > 0)
    r.release()
  }

  test("the routed operator: a wide-pool-solvable target takes the SOLVED arm") {
    // same geometry as the wide-pool test: 0.999 at threshold 0.2 needs
    // 32 < L <= 64 — the routed form must solve it, not fall back
    SimilarityOps.nearDupPairsLshAtRecallOrTopK(
      randomEmb(2000, 32), 0.2, targetRecall = 0.999, k = 5,
      minHeadRecall = 0.2, calibQueries = 30) match {
      case SimilarityOps.LshRouteSolved(r) =>
        assert(r.tables > SimilarityOps.LshAutoMaxTables &&
          r.tables <= SimilarityOps.LshWideMaxTables, r.toString)
        r.release()
      case SimilarityOps.LshRouteTopK(_, why, _) =>
        fail(s"a solvable target must not route to top-k: $why")
    }
  }

  test("the routed operator: a target past even the 64-table pool routes to the top-k surface") {
    // threshold 0.0 on structureless data: measured calibration recall
    // 0.584779 at 8 tables — the floor-micro schedule bottoms out at
    // miss 883 at 64 tables, so a 0.9999 target (tolerance 100) is
    // unreachable even at the full wide pool (the >64 dead end the
    // r12 either/or left open; r13 verdict item 3) — instead of raising,
    // the routed form returns the head-recall-contracted arc surface,
    // with the unreachable diagnosis carried for audit
    SimilarityOps.nearDupPairsLshAtRecallOrTopK(
      randomEmb(2000, 32), 0.0, targetRecall = 0.9999, k = 5,
      minHeadRecall = 0.2, calibQueries = 30) match {
      case SimilarityOps.LshRouteSolved(r) =>
        fail(s"this geometry must be unreachable even at 64 tables: $r")
      case SimilarityOps.LshRouteTopK(arcs, why, release) =>
        assert(why.contains("UNREACHABLE"), why)
        assert(why.contains(s"${SimilarityOps.LshWideMaxTables}-table"),
          s"the diagnosis must name the WIDE ceiling it tried: $why")
        assert(arcs.count() > 0, "the fallback arc surface must be real")
        release()
    }
  }

  test("the wide pool's first 32 tables are bit-identical to the default pool") {
    // prefix stability is what keeps every committed oracle hash valid:
    // Seq.fill draws sequentially, so widening the pool only APPENDS
    assert(SimilarityOps.autoTableHyperplanes.size ==
      SimilarityOps.LshWideMaxTables)
    // spot-check the last default-pool table against the documented
    // generator replayed locally
    val rnd = new scala.util.Random(SimilarityOps.LshSeed + 2)
    val regen = Seq.fill(SimilarityOps.LshAutoMaxTables)(
      Seq.fill(SimilarityOps.LshAutoMaxBits)(Array.fill(
        SimilarityOps.LshDim)(if (rnd.nextBoolean()) 1.0 else -1.0)))
    assert((0 until SimilarityOps.LshAutoMaxTables).forall(t =>
      SimilarityOps.autoTableHyperplanes(t).zip(regen(t))
        .forall { case (a, b) => a.sameElements(b) }))
  }
}
