package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class DbscanSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def run(universe: Seq[Long], pairs: Seq[(Long, Long)],
      minPts: Long): Map[Long, (String, Long)] =
    SimilarityOps.dbscan(
      universe.toDF("vec_id"), pairs.toDF("vec_a", "vec_b"), minPts)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("chain: interior cores cluster, endpoints are border, isolates noise") {
    val out = run(1L to 6L, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 2L)
    assert(out(2L) == (("core", 2L)))
    assert(out(3L) == (("core", 2L)))
    assert(out(4L) == (("core", 2L)))
    assert(out(1L) == (("border", 2L)))
    assert(out(5L) == (("border", 2L)))
    assert(out(6L) == (("noise", -1L))) // in the universe, no edges
  }

  test("star: a lone core among borders forms its own singleton cluster") {
    val out = run(1L to 4L, Seq((1L, 2L), (1L, 3L), (1L, 4L)), 3L)
    assert(out(1L) == (("core", 1L)))
    assert(out(2L) == (("border", 1L)))
    assert(out(3L) == (("border", 1L)))
    assert(out(4L) == (("border", 1L)))
  }

  test("a border between two clusters takes the minimum cluster id") {
    // two K4 cliques (every member degree >= 3 = core) bridged by node
    // 7, degree 2 => border with one core neighbor in each cluster:
    // assigned min(cluster 1, cluster 10) = 1
    def k4(ns: Seq[Long]) =
      for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j))
    val out = run(Seq(1L, 2L, 3L, 4L, 7L, 10L, 11L, 12L, 13L),
      k4(Seq(1L, 2L, 3L, 4L)) ++ k4(Seq(10L, 11L, 12L, 13L)) ++
        Seq((4L, 7L), (7L, 10L)), 3L)
    assert(out(4L) == (("core", 1L)))
    assert(out(10L) == (("core", 10L)))
    assert(out(7L) == (("border", 1L)))
    // the bridge's edges don't merge the two core components
    assert(out(11L) == (("core", 10L)))
  }

  test("minPts above every degree makes everything noise") {
    val out = run(1L to 3L, Seq((1L, 2L), (2L, 3L)), 5L)
    assert(out.values.forall(_ == (("noise", -1L))))
  }
}
