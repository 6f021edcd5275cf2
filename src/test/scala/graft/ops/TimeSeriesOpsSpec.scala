package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("gapFillCounts densifies each key's own span, zero-filling empty buckets") {
    val ev = Seq(
      (1L, 5L), (1L, 15L), (1L, 17L), (1L, 35L), // buckets 0,1,1,3 (width 10) — bucket 2 empty
      (2L, 20L)                                  // single-bucket key
    ).toDF("k", "ts")
    val out = TimeSeriesOps.gapFillCounts(ev, "k", "ts", bucketWidth = 10L)
      .orderBy("k", "bucket_start").collect()
    assert(out.toSeq == Seq(
      Row(1L, 0L, 1L),
      Row(1L, 10L, 2L),
      Row(1L, 20L, 0L), // the gap, surfaced
      Row(1L, 30L, 1L),
      Row(2L, 20L, 1L)))
  }

  test("gapFillCounts drops null keys/timestamps and aggregates before generating") {
    val ev = Seq(
      (Some(1L), Some(5L)), (None, Some(7L)), (Some(1L), None)
    ).toDF("k", "ts")
    val out = TimeSeriesOps.gapFillCounts(ev, "k", "ts", 10L).collect()
    assert(out.toSeq == Seq(Row(1L, 0L, 1L)))
    // generation happens on the aggregated grid, not the raw event rows:
    // the explode consumes the (key, lo, hi) span aggregate
    val p = TimeSeriesOps.gapFillCounts(ev, "k", "ts", 10L)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("Generate") && p.contains("Aggregate"))
  }
}
