package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Hilbert key's defining properties on a full small grid: a
  * bijection onto [0, 4^bits) whose CONSECUTIVE keys are always grid
  * neighbors — the continuity the z-curve does not have.
  */
class LayoutHilbertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hilbertKey is a continuous bijection on the 8x8 grid") {
    val cells = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val keyed = cells.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.hilbertKey(col("a"), col("b"), 3).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // bijection onto [0, 64)
    assert(keyed.map(_._1).toSeq == (0L until 64L))
    // continuity: every consecutive pair is one grid step apart
    keyed.sliding(2).foreach { case Array((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d2: ($x1,$y1) -> ($x2,$y2)")
    }
    // the curve starts at the origin corner
    assert(keyed.head._2 == ((0L, 0L)))
  }

  test("the z-curve jumps where Hilbert does not (the locality contrast)") {
    val cells = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val both = cells.toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b"), 3).as("z"),
        col("a"), col("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    val jumps = both.sliding(2).count {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "z-order is expected to jump at quadrant seams")
  }

  test("hilbertKey distinct-count and range hold at 10 bits on real keys") {
    val df = (0L until 500L).map(i => (i * 7 % 1024, i * 13 % 1024))
      .toDF("a", "b")
      .select(Layout.hilbertKey(col("a"), col("b"), 10).as("d"))
    val ds = df.collect().map(_.getLong(0))
    assert(ds.forall(d => d >= 0L && d < (1L << 20)))
    assert(ds.distinct.length == ds.length, "distinct cells -> distinct keys")
  }
}
