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

  test("emaSmooth: exact micro recursion, event-time order, independent keys") {
    import spark.implicits._
    // key 1 fed OUT of order: sorted series is 4.0, 2.0, 2.0
    // s0 = 4e6; s1 = round(1e6 + 2e6) = 3e6; s2 = round(1e6 + 1.5e6) = 2.5e6
    val ev = Seq(
      (1L, 30L, 102L, 2.0), (1L, 10L, 100L, 4.0), (1L, 20L, 101L, 2.0),
      (2L, 5L, 200L, 7.0)
    ).toDF("k", "ts", "seq", "v")
    val out = TimeSeriesOps.emaSmooth(ev, "k", "ts", "seq", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 100L) -> 4000000L,
      (1L, 101L) -> 3000000L,
      (1L, 102L) -> 2500000L,
      (2L, 200L) -> 7000000L))
    // ts ties break on the sequence column
    val tied = Seq((1L, 10L, 1L, 0.0), (1L, 10L, 0L, 8.0))
      .toDF("k", "ts", "seq", "v")
    val t = TimeSeriesOps.emaSmooth(tied, "k", "ts", "seq", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(t == Map(0L -> 8000000L, 1L -> 4000000L))
  }

  test("emaSmooth: the hot-key guard names the offending key") {
    import spark.implicits._
    val ev = Seq((9L, 1L, 1L, 1.0), (9L, 2L, 2L, 1.0), (9L, 3L, 3L, 1.0))
      .toDF("k", "ts", "seq", "v")
    val e = intercept[Exception] {
      TimeSeriesOps.emaSmooth(ev, "k", "ts", "seq", "v",
        maxEventsPerKey = 2).collect()
    }
    assert(e.getMessage.contains("emaSmooth") && e.getMessage.contains("9"),
      e.getMessage)
  }
}
