package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** PSI drift report + mergeable histogram quantiles. */
class DriftHistSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("psiDrift: identical batches score exactly zero everywhere") {
    val batch = Seq(5.0, 15.0, 15.0, 25.0).toDF("v")
    val out = ProfileOps.psiDrift(batch, batch, "v", 4, 0L, 10000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.values.forall(_ == 0L))
    assert(out.size == 4)
  }

  test("psiDrift: a full shift produces large terms, smoothing keeps empties finite") {
    // ref lives entirely in bin 0, cur entirely in the clamped top bin
    val ref = Seq.fill(50)(1.0).toDF("v")
    val cur = Seq.fill(50)(999.0).toDF("v") // clamps into bin 3
    val out = ProfileOps.psiDrift(ref, cur, "v", 4, 0L, 10000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) > 1000000L, "ref-only bin contributes strongly")
    assert(out(3L) > 1000000L, "cur-only bin contributes strongly")
    // untouched middle bins: both smoothed to 1/(n+bins), term exactly 0
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("histogram quantiles: exact ranks on a known grid") {
    val facts = (1 to 100).map(_.toDouble).toDF("v")
    val h = ChangeOps.microHistogram(facts, "v", 10, 0L, 10000000L)
    val out = ChangeOps.mergeHistogramQuantiles(Seq(h), Seq(500, 990),
      0L, 10000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // rank 50 → bin 5 (cum 9+50=59); edge 50e6
    assert(out(500L) == ((5L, 50000000L, 59L)))
    // rank 99 → bin 9 (cum 100, incl. the clamped 100.0); edge 90e6
    assert(out(990L) == ((9L, 90000000L, 100L)))
  }

  test("histogram merge identity: any split merges to the full recompute") {
    val facts = (1 to 100).map(i => (i % 37) * 3.5)
    def hist(xs: Seq[Double]) = ChangeOps.microHistogram(
      xs.toDF("v"), "v", 8, 0L, 20000000L)
    val full = ChangeOps.mergeHistogramQuantiles(Seq(hist(facts)),
      Seq(500, 900), 0L, 20000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    for (cut <- Seq(0, 1, 37, 99, 100)) {
      val (a, b) = facts.splitAt(cut)
      val merged = ChangeOps.mergeHistogramQuantiles(
        Seq(hist(a), hist(b)), Seq(500, 900), 0L, 20000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(merged == full, s"split at $cut diverged")
    }
  }
}
