package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** knnGraphAtHeadRecall — the enforcement form of the topk_recall card:
  * a kNN-graph build that measures ranking-head recall on a fixed
  * stripe before handing arcs to downstream analytics, and fails BY
  * NAME (with the frontier's table-count fix) when the generator is
  * missing the strongest edges.
  */
class KnnGraphContractSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def sfEmb(sf: String): DataFrame =
    SimilarityOps.withNorm(graft.etl.Ingest
      .table(spark, s"/root/testdata/$sf", "embeddings")
      .select(col("vec_id"), col("embedding")))

  /** Structureless deterministic corpus (splitmix64 components): truth
    * at a low threshold sits near-orthogonal — the regime where the
    * default generator's head recall genuinely reads low.
    */
  private def randomEmb(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
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

  test("contract met: returns degree-capped arcs (<= k per source)") {
    val k = 4
    val arcs = SimilarityOps.knnGraphAtHeadRecall(
      sfEmb("sf0.01"), threshold = 0.25, k = k, minHeadRecall = 0.9,
      calibQueries = 20)
    val perSrc = arcs.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(perSrc <= k, s"a source kept $perSrc > $k arcs")
    assert(arcs.count() > 0)
  }

  test("bad head-recall reading fails BY NAME with the frontier fix") {
    // structureless corpus at a low threshold: the true top-k sits at
    // near-orthogonal cosines the default 8-table generator misses
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnGraphAtHeadRecall(
        randomEmb(2000, 32), threshold = 0.0, k = 8,
        minHeadRecall = 0.999, calibQueries = 30)
    }
    assert(e.getMessage.contains("BELOW"), e.getMessage)
    assert(e.getMessage.contains("rebuild with tables") ||
      e.getMessage.contains("NO table count"), e.getMessage)
  }

  test("a truthless stripe raises BY NAME, not a silent pass") {
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnGraphAtHeadRecall(
        randomEmb(200, 32), threshold = 0.999999, k = 4,
        minHeadRecall = 0.9, calibQueries = 10)
    }
    assert(e.getMessage.contains("NO true"), e.getMessage)
  }
}
