package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cost-routed [[SimilarityOps.nearDupPairs]] (r17): the
  * collect arm (in-cell expansion) and the join arm (label-keyed
  * self-join, the cell-size-unbounded scale form) must emit IDENTICAL
  * pairs, the selector must route on the measured max cell size, and
  * the ×100 failure mode this closes — a cell past the collect ceiling
  * — must COMPUTE on the join arm where the collect arm raises.
  */
class NearDupRegimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus() = {
    import spark.implicits._
    // labels: cell 1 has 3 members (2 near-dup pairs above 0.5, one
    // below), cell 2 has 2 (one anti-aligned pair), one NULL-label cell
    // with 2 members (groupBy keeps a null cell — the join arm must
    // match via null-safe equality), label 3 a singleton (no pairs)
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), Some(1)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0), Some(1)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0), Some(1)),
      (4L, Seq(0.5, 0.5, 0.0, 0.0), Some(2)),
      (5L, Seq(-0.5, -0.5, 0.0, 0.0), Some(2)),
      (6L, Seq(0.2, 0.8, 0.0, 0.0), None),
      (7L, Seq(0.2, 0.7, 0.1, 0.0), None),
      (8L, Seq(0.0, 0.0, 0.0, 1.0), Some(3)))
    SimilarityOps.withNorm(
      rows.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<double>"),
          col("label").cast("int")))
  }

  private def asSet(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def hasJoin(d: org.apache.spark.sql.DataFrame) =
    d.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  test("maxLabelCell measures the biggest cell (null labels form a cell)") {
    assert(SimilarityOps.maxLabelCell(corpus()) == 3L)
    assert(SimilarityOps.maxLabelCell(corpus().filter(lit(false))) == 0L)
  }

  test("both arms emit identical pairs and the selector routes on cell size") {
    val c = corpus()
    val viaCollect = SimilarityOps.nearDupPairs(c, 0.5, maxBucket = 1000)
    val viaJoin = SimilarityOps.nearDupPairs(c, 0.5, maxBucket = 2)
    assert(!hasJoin(viaCollect), "cells fit: the collect arm")
    assert(hasJoin(viaJoin), "a cell past the ceiling: the join arm")
    val expected = asSet(viaCollect)
    assert(expected.nonEmpty, "the fixture must produce pairs")
    assert(asSet(viaJoin) == expected,
      "the selector must never change the emitted pairs")
    // pair orientation: vec_a < vec_b on both arms (the collect arm's
    // sort_array order — vec_id leads the struct)
    assert(expected.forall { case (a, b, _) => a < b })
    // the null-label cell pairs appear (null-safe join equality)
    assert(expected.exists { case (a, b, _) => a == 6L && b == 7L })
  }

  test("selector boundary agrees with the guard: maxCell == ceiling stays collect") {
    // the hot-cell guard raises on n > ceiling and the selector routes
    // to the join arm on maxCell > ceiling — at equality the collect
    // arm runs guard-silent, so routing exactly covers the raise (the
    // ×100 failure this closes: a cell past the ceiling now computes
    // on the join arm instead of raising by name)
    val c = corpus()
    val atBoundary = SimilarityOps.nearDupPairs(c, 0.5, maxBucket = 3)
    assert(!hasJoin(atBoundary), "maxCell == ceiling: still the collect arm")
    assert(asSet(atBoundary) ==
      asSet(SimilarityOps.nearDupPairs(c, 0.5, maxBucket = 1000)))
  }
}
