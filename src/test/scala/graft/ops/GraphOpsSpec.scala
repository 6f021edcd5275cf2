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

  test("pagerankDirected: sinks redistribute mass, source-only nodes keep the floor") {
    // 1 → 2 → 3 and 4 → 2: node 3 is a sink (dangling), 1 and 4 are
    // source-only (no in-edges)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 2L)).toDF("s", "d")
    val r = GraphOps.pagerankDirected(edges, "s", "d")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L), "no node may drop out")
    // without dangling redistribution the sink's mass (≈0.3+) leaks
    // every iteration and Σrank collapses; with it the vector stays a
    // distribution
    assert(math.abs(r.values.sum - 1.0) < 1e-3, s"mass ~1: ${r.values.sum}")
    // rank order: 2 collects from two sources; 3 collects all of 2
    assert(r(2L) > r(1L) && r(3L) > r(1L), s"collectors outrank sources: $r")
    // source-only nodes: teleport floor + their dangling share only
    assert(r(1L) == r(4L), s"symmetric sources tie: $r")

    // exact replay against a plain-Scala reference of the same
    // arithmetic contract (6dp rounds, exact dangling sum)
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Map(1L -> Seq(2L), 2L -> Seq(3L), 4L -> Seq(2L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    var ranks = nodes.map(_ -> rnd(1.0 / 4)).toMap
    for (_ <- 1 to GraphOps.DefaultIters) {
      val contribs = out.toSeq.flatMap { case (s, ds) =>
        ds.map(_ -> BigDecimal(rnd(ranks(s) / ds.length)))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val dang = nodes.filterNot(out.contains)
        .map(n => BigDecimal(ranks(n))).sum
      ranks = nodes.map(n => n -> rnd(
        0.15 / 4 + 0.85 * (contribs.getOrElse(n, BigDecimal(0)).toDouble +
          dang.toDouble / 4))).toMap
    }
    assert(r == ranks, s"engine $r vs reference $ranks")
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("triangleCounts: one triangle, each corner counted once") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: K4 puts every node in 3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: pendant nodes and duplicate/reversed edges don't count") {
    // triangle 1-2-3 with pendant 4, the triangle's edges also fed
    // reversed and duplicated — normalization must not double-count
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (3L, 4L), (4L, 4L))
    assert(tri(e) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: two triangles sharing an edge") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(e) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  private def lp(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("a", "b"), "a", "b", iters)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("labelPropagation: a clique converges to its minimum id and stays") {
    val e = Seq((5L, 6L), (6L, 7L), (5L, 7L))
    // r1: 5→min(6,7)=6, 6→5, 7→5; r2 onward: everyone sees a 5-majority
    assert(lp(e, 2) == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
    assert(lp(e, 3) == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("labelPropagation: synchronous rounds replay exactly on a path") {
    val e = Seq((1L, 2L), (2L, 3L))
    // r1: 1→2, 2→min(1,3)=1, 3→2
    assert(lp(e, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // r2: 1→(2's r1 label)=1, 2→both ends carry 2 → 2, 3→1
    assert(lp(e, 2) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("labelPropagation: disjoint components never mix labels") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val out = lp(e, 3)
    assert(out.filter(_._1 < 10L).values.toSet == Set(1L))
    assert(out.filter(_._1 >= 10L).values.toSet == Set(10L))
  }

  private def bfs(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxHops: Int): Map[Long, Long] =
    GraphOps.bfsHops(edges.toDF("a", "b"), "a", "b",
      sources.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfsHops: hop distance along a path, cut at maxHops") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(bfs(path, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: multi-source takes the minimum hop; edges are undirected") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(bfs(path, Seq(1L, 6L), 4) == Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("bfsHops: cycles terminate, off-graph sources appear at hop 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(bfs(tri, Seq(1L, 99L), 5) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 99L -> 0L))
  }

  test("bfsHops: visited's plan stays FLAT — node count bounded in maxHops") {
    // the per-round localCheckpoint collapses each round's unionAll into
    // a LogicalRDD, so the returned plan must not grow with maxHops (the
    // pre-r9 cache()-per-round form returned a maxHops-deep union chain
    // AND pinned O(hops) caches). 40 hops over a 6-node path: the loop
    // also short-circuits once the frontier dries up (diameter 5).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val out = GraphOps.bfsHops(path, "a", "b", Seq(1L).toDF("node"), 40)
    val nodes = out.queryExecution.analyzed.collect { case p => p }.size
    assert(nodes <= 4,
      s"bfsHops visited plan has $nodes nodes — lineage is growing per hop")
    assert(out.count() == 6L)
  }

  test("modularityTerms: two bridged triangles give the textbook Q = 5/14") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4: m = 7; each
    // community: e_c = 3, d_c = 7 -> q_num = 4*7*3 - 49 = 35, den 196;
    // Q = 2*35/196 = 0.357...
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val got = GraphOps.modularityTerms(edges, "a", "b", labels)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(10L) == ((3L, 3L, 7L, 35L, 196L)))
    assert(got(20L) == ((3L, 3L, 7L, 35L, 196L)))
    // a deliberately bad split (cross-cutting labels) scores lower
    val bad = Seq((1L, 10L), (2L, 20L), (3L, 10L),
      (4L, 20L), (5L, 10L), (6L, 20L)).toDF("node", "label")
    val qBad = GraphOps.modularityTerms(edges, "a", "b", bad)
      .collect().map(r => r.getLong(4)).sum
    assert(qBad < 70L, s"bad split q_num sum $qBad should trail 70")
  }

  test("onionLayers: the fringe peels inward with exact round labels") {
    // triangle {1,2,3} + tail 3-4-5: round 1 drops 5, round 2 drops 4,
    // the triangle survives at layer 0
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphOps.onionLayers(g, "a", "b", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 1L, 4L -> 2L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    // a path peels symmetrically from both ends
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val lp = GraphOps.onionLayers(path, "a", "b", 2, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp == Map(1L -> 1L, 6L -> 1L, 2L -> 2L, 5L -> 2L,
      3L -> 3L, 4L -> 3L))
  }

  test("kCore: pendant chain peels away, the cycle survives with exact degrees") {
    // triangle 1-2-3 plus a tail 3-4-5: the 2-core is exactly the
    // triangle; the tail cascades away over two rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphOps.kCore(edges, "a", "b", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: a tree has no 2-core; a clique is its own (n-1)-core") {
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L)).toDF("a", "b")
    assert(GraphOps.kCore(tree, "a", "b", 2, 4).collect().isEmpty)
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("a", "b")
    val got = GraphOps.kCore(k4, "a", "b", 3, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("kCore: insufficient rounds leave the unpeeled tail (the bounded contract)") {
    // path 1-2-3-4-5-6: each round peels only the current endpoints, so
    // 1 round leaves 2-3-4-5, and 3 rounds empty it
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val one = GraphOps.kCore(path, "a", "b", 2, 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(2L, 3L, 4L, 5L))
    assert(GraphOps.kCore(path, "a", "b", 2, 3).collect().isEmpty)
  }

  test("linkPrediction: common neighbors, non-adjacent only, exact jaccard") {
    // star: hub 1 - {2,3,4}; plus 2-3 edge. Non-adjacent distance-2
    // pairs: (2,4) cn=1 via 1, (3,4) cn=1 via 1. Pair (2,3) is adjacent
    // (excluded) despite sharing neighbor 1.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("a", "b")
    val got = GraphOps.linkPrediction(edges, "a", "b", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // deg: 1->3, 2->2, 3->2, 4->1. (2,4): 1/(2+1-1)=0.5; (3,4): same.
    assert(got.toSet == Set((2L, 4L, 1L, 500000L), (3L, 4L, 1L, 500000L)))
  }

  test("linkPrediction: top-k order is (cn, jaccard, u, v) and self/dups ignored") {
    // K4 minus edge (3,4): (3,4) has cn=2 (via 1 and 2)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 3L), (4L, 3L)) // self-loop dropped; (4,3) duplicate of nothing -> adjacent
      .toDF("a", "b")
    val got = GraphOps.linkPrediction(edges, "a", "b", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (3,4) IS adjacent here via (4,3) -> no candidates at all
    assert(got.isEmpty)
    val edges2 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val got2 = GraphOps.linkPrediction(edges2, "a", "b", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only candidate: (3,4) cn=2, deg3=deg4=2 -> 2/(2+2-2)=1.0
    assert(got2.toSeq == Seq((3L, 4L, 2L, 1000000L)))
  }

  test("knnGraph: per-node cap keeps the highest-similarity arcs") {
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (1L, 4L, 0.7),
      (2L, 3L, 0.6)).toDF("a", "b", "s")
    val arcs = GraphOps.knnGraph(pairs, "a", "b", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // node 1 has three candidates — the weakest (→4) is cut; every
    // other node is under the cap and keeps everything
    assert(arcs == Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 2L), (4L, 1L)), s"arcs: $arcs")
  }

  test("knnGraph: a cap at max degree leaves BFS reach unchanged") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.7))
      .toDF("a", "b", "s")
    val src = Seq(1L).toDF("node")
    val full = GraphOps.bfsHops(pairs, "a", "b", src, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = GraphOps.bfsHops(
      GraphOps.knnGraph(pairs, "a", "b", "s", 2), "src", "dst", src, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == capped && full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
