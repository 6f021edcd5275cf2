package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SkylineOps.skyline2 against the brute-force strict-domination
  * definition, on shapes built to stress the grid prune: duplicate
  * points, equal-price ties, monotone chains, degenerate ranges, and
  * far-more-bins-than-distinct-values.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute force: strict 2D domination, maximize x minimize y. */
  private def brute(pts: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) =>
        ox >= x && oy <= y && (ox > x || oy < y)
      }
    }.toSet

  private def run(pts: Seq[(Long, Double, Int)], nBins: Int = 32): Set[(Long, Double, Int)] =
    SkylineOps.skyline2(
      pts.toDF("id", "x", "y").repartition(5), "x", "y", nBins)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet

  test("matches brute force on a deterministic pseudo-random cloud") {
    val pts = (0L until 400L).map(i =>
      (i, (i * 37 % 101).toDouble, (i * 53 % 97).toInt))
    assert(run(pts) == brute(pts))
  }

  test("duplicate frontier points all surface; equal-x ties resolve by y") {
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), // duplicates on the frontier
      (3L, 10.0, 7),                // same x, worse y -> dominated
      (4L, 12.0, 9), (5L, 8.0, 3),
      (6L, 8.0, 3), (7L, 8.0, 9))   // 7 dominated by 5/6
    val got = run(pts)
    assert(got == brute(pts))
    assert(got.map(_._1) == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("a strictly monotone chain is entirely on the skyline") {
    val pts = (0L until 100L).map(i => (i, i.toDouble, i.toInt))
    assert(run(pts) == pts.toSet)
  }

  test("a reverse chain collapses to the single best point") {
    val pts = (0L until 100L).map(i => (i, i.toDouble, (100 - i).toInt))
    assert(run(pts) == Set((99L, 99.0, 1)))
  }

  test("degenerate range: all points share one x (hi == lo branch)") {
    val pts = Seq((1L, 5.0, 9), (2L, 5.0, 2), (3L, 5.0, 2), (4L, 5.0, 4))
    assert(run(pts) == Set((2L, 5.0, 2), (3L, 5.0, 2)))
  }

  test("more bins than distinct values, and nulls are excluded") {
    val pts = Seq((1L, 1.0, 1), (2L, 2.0, 2), (3L, 3.0, 1), (4L, 2.0, 1))
    assert(run(pts, nBins = 64) == brute(pts))
    val withNull = pts.toDF("id", "x", "y")
      .unionByName(Seq((9L, null.asInstanceOf[java.lang.Double], 0))
        .toDF("id", "x", "y"))
    val got = SkylineOps.skyline2(withNull, "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(9L))
  }

  test("result is independent of bin count (4 vs 32 vs 256)") {
    val pts = (0L until 300L).map(i =>
      (i, (i * 17 % 59).toDouble, (i * 29 % 61).toInt))
    val expected = brute(pts)
    assert(run(pts, 4) == expected)
    assert(run(pts, 32) == expected)
    assert(run(pts, 256) == expected)
  }
}
