package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank: symmetric pair is the uniform fixed point") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val r = GraphOps.pagerank(edges, "a", "b")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // two symmetric nodes: 0.5 each is exactly preserved by the damped
    // update round(0.15/2 + 0.85*0.5, 6) = 0.5
    assert(r == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("pagerank: a hub outranks its leaves, mass stays normalized") {
    // star: 0 at the center of 1,2,3
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = GraphOps.pagerank(edges, "a", "b")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    assert(r(0L) > r(1L), s"center must outrank a leaf: $r")
    assert(r(1L) == r(2L) && r(2L) == r(3L), s"leaves are symmetric: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-4, s"mass ~1: ${r.values.sum}")
  }
}
