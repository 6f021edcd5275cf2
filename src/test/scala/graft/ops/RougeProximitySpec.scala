package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ROUGE pair scoring, the weighted reservoir, and proximity search. */
class RougeProximitySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"))

  test("rougeAdjacent: identical texts score a perfect 1.0 on every surface") {
    val out = TextOps.rougeAdjacent(docs(
      1L -> "a b c d", 2L -> "a b c d")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("ov1") == 4L && r.getAs[Long]("ov2") == 3L)
    assert(r.getAs[Long]("r1_f_micro") == 1000000L)
    assert(r.getAs[Long]("r2_f_micro") == 1000000L)
  }

  test("rougeAdjacent: clipping caps repeated grams at the reference count") {
    // cand repeats 'a' ×4; ref has 'a' once → clipped overlap 1,
    // P = 1/4, R = 1/2, F = 2·(1/4)(1/2)/(3/4) = 1/3
    val r = TextOps.rougeAdjacent(docs(
      1L -> "a a a a", 2L -> "a b")).collect().head
    assert(r.getAs[Long]("ov1") == 1L)
    assert(r.getAs[Long]("r1_p_micro") == 250000L)
    assert(r.getAs[Long]("r1_r_micro") == 500000L)
    assert(r.getAs[Long]("r1_f_micro") == 333333L)
  }

  test("rougeAdjacent: zero overlap still surfaces the pair at score 0") {
    val r = TextOps.rougeAdjacent(docs(
      1L -> "a b", 2L -> "x y")).collect().head
    assert(r.getAs[Long]("ov1") == 0L && r.getAs[Long]("r1_f_micro") == 0L)
    assert(r.getAs[Long]("r2_f_micro") == 0L)
  }

  test("rougeL: in-row LCS — identity, reordering, and interleaving") {
    // identical → LCS = m, F = 1
    val id = TextOps.rougeL(docs(1L -> "a b c d", 2L -> "a b c d"))
      .collect().head
    assert(id.getAs[Long]("lcs") == 4L && id.getAs[Long]("rl_f_micro") == 1000000L)
    // full reversal of distinct tokens → LCS = 1 (any single token)
    val rev = TextOps.rougeL(docs(1L -> "a b c d", 2L -> "d c b a"))
      .collect().head
    assert(rev.getAs[Long]("lcs") == 1L)
    // classic interleave: X = "a b c b d a b", Y = "b d c a b a" → LCS 4
    // ("b c a b" / "b d a b")
    val mix = TextOps.rougeL(docs(1L -> "a b c b d a b", 2L -> "b d c a b a"))
      .collect().head
    assert(mix.getAs[Long]("lcs") == 4L, s"lcs: $mix")
    // P = 4/7, R = 4/6, F = 2PR/(P+R) = 8/13 ≈ 0.615385
    assert(mix.getAs[Long]("rl_f_micro") == 615385L, s"f: $mix")
  }

  test("weightedReservoir: exactly k per stratum, heavier keys drawn more often") {
    val df = (1L to 200L).map(i => (i, "s", if (i <= 100) 1.0 else 50.0))
      .toDF("id", "src", "w")
    val out = SampleOps.weightedReservoir(df, "id", "src", col("w"), 10)
      .collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 10L))
    // inclusion ∝ weight: the 50×-heavier half should dominate the draw
    val heavy = out.count(_.getAs[Long]("key") > 100L)
    assert(heavy >= 8, s"heavy draws: $heavy of 10")
    // deterministic: a rerun draws the same rows in the same order
    val again = SampleOps.weightedReservoir(df, "id", "src", col("w"), 10)
      .collect()
    assert(out.map(_.getAs[Long]("key")).toSeq ==
      again.map(_.getAs[Long]("key")).toSeq)
  }

  test("weightedReservoir: non-positive weights are never drawn") {
    val df = Seq((1L, "s", 0.0), (2L, "s", -3.0), (3L, "s", 2.0))
      .toDF("id", "src", "w")
    val out = SampleOps.weightedReservoir(df, "id", "src", col("w"), 5)
      .collect()
    assert(out.map(_.getAs[Long]("key")).toSeq == Seq(3L))
  }

  test("proximityPair: min gap and phrase hits over hand-placed positions") {
    val df = Seq(
      (1L, "data x y spark z data spark"), // gaps: |0-3|,|0-6|,|5-3|,|5-6|=1; phrase at 5→6
      (2L, "spark q q q data"),            // gap 4, no ordered adjacency
      (3L, "data only here")               // missing termB → excluded
    ).toDF("doc_id", "text")
    val out = RetrievalOps.proximityPair(df, "data", "spark", 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.head.getAs[Long]("min_gap") == 1L)
    assert(out.head.getAs[Long]("phrase_hits") == 1L)
    assert(out(1).getAs[Long]("min_gap") == 4L)
    assert(out(1).getAs[Long]("phrase_hits") == 0L)
  }
}
