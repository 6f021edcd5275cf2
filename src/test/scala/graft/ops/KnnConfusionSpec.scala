package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class KnnConfusionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def confusion(rows: Seq[(Long, Array[Float], Int)], k: Int,
      queryIds: Seq[Long] = Nil): Map[(Int, Int), Long] = {
    val c = SimilarityOps.withNorm(rows.toDF("vec_id", "embedding", "label"))
    val q = if (queryIds.isEmpty) c
      else c.filter(col("vec_id").isin(queryIds: _*))
    ClassifierOps.knnConfusion(c, q, k)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  test("leave-one-out 1-NN on two separated direction clusters is perfect") {
    val rows = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.1f, 0.9f), 1))
    assert(confusion(rows, k = 1) == Map((0, 0) -> 2L, (1, 1) -> 2L))
  }

  test("a mislabeled point is outvoted by its true-cluster neighbors") {
    val rows = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.95f, 0.05f), 0),
      (2L, Array(0.9f, 0.1f), 1), // sits in the 0-cluster, labeled 1
      (3L, Array(0f, 1f), 1), (4L, Array(0.05f, 0.95f), 1))
    // query 2 with k=2: neighbors 1 and 0 (both label 0) ⇒ predicted 0
    assert(confusion(rows, k = 2, queryIds = Seq(2L)) == Map((1, 0) -> 1L))
  }

  test("a split vote resolves to the smaller label") {
    val rows = Seq(
      (0L, Array(1f, 1f), 9),  // the query, equidistant from both axes
      (1L, Array(1f, 0f), 5),
      (2L, Array(0f, 1f), 2))
    // k=2: one vote each for labels 5 and 2 ⇒ deterministic min label 2
    assert(confusion(rows, k = 2, queryIds = Seq(0L)) == Map((9, 2) -> 1L))
  }
}
