package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Theil-Sen and SAX — the round-9 robust-series additions. */
class RobustSeriesSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // timestamps in micros: i seconds apart so slopes read per-second
  private def ts(i: Long) = i * 1000000L

  test("theilSen: an exact line recovers its slope from every pair") {
    val ev = (0L to 4L).map(i => (1L, ts(i), 2.0 * i + 5.0))
      .toDF("k", "t", "v")
    val r = TimeSeriesOps.theilSen(ev, "k", "t", "v").collect().head
    assert(r.getAs[Long]("n_pts") == 5L)
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("slope_micro") == 2000000L)
  }

  test("theilSen: one wild outlier cannot drag the median slope") {
    // line of slope 1 with one point shot to 1000: OLS would explode;
    // the pairwise-slope median stays 1
    val ev = ((0L to 5L).map(i => (1L, ts(i), i.toDouble)) :+
      ((1L, ts(6L), 1000.0))).toDF("k", "t", "v")
    val r = TimeSeriesOps.theilSen(ev, "k", "t", "v").collect().head
    assert(r.getAs[Long]("slope_micro") == 1000000L, s"robust median: $r")
  }

  test("theilSen: equal-timestamp pairs are excluded; a lone point drops") {
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(0), 9.0), (1L, ts(1), 2.0), // one dup ts
      (2L, ts(0), 7.0) // single point: zero pairs → dropped
    ).toDF("k", "t", "v")
    val out = TimeSeriesOps.theilSen(ev, "k", "t", "v").collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
    // pairs: (1.0→2.0) slope 1, (9.0→2.0) slope −7; lower median = −7
    assert(out.head.getAs[Long]("n_pairs") == 2L)
    assert(out.head.getAs[Long]("slope_micro") == -7000000L)
  }

  test("theilSen: the quadratic hot-key guard raises, naming the key") {
    val ev = (0L to 4L).map(i => (7L, ts(i), i.toDouble)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      TimeSeriesOps.theilSen(ev, "k", "t", "v", maxEventsPerKey = 4)
        .collect()
    }
    assert(e.getMessage.contains("theilSen") && e.getMessage.contains("7"),
      e.getMessage)
    // and within the bound the same input still computes
    assert(TimeSeriesOps.theilSen(ev, "k", "t", "v", maxEventsPerKey = 5)
      .count() == 1)
  }

  test("sax: a rising line reads 'abcd'; a flat line reads all-'c'") {
    val rising = (0L to 7L).map(i => (1L, ts(i), i, i.toDouble))
      .toDF("k", "t", "tie", "v")
    val r = TimeSeriesOps.sax(rising, "k", "t", "tie", "v").collect().head
    assert(r.getAs[Long]("n_pts") == 8L)
    assert(r.getAs[String]("sax_word") == "abcd", s"rising: $r")
    val flat = (0L to 7L).map(i => (1L, ts(i), i, 3.5))
      .toDF("k", "t", "tie", "v")
    assert(TimeSeriesOps.sax(flat, "k", "t", "tie", "v").collect()
      .head.getAs[String]("sax_word") == "cccc")
  }

  test("ljungBox: a trending series rejects whiteness; short keys report null") {
    // strong linear trend → lag-1..3 autocorrelations all near 1 →
    // Q far above the χ²(3) 5% bar
    val trend = (0L to 39L).map(i => (1L, ts(i), i, i.toDouble))
    // 4 points: lag-3 leaves only 1 pair (< 3) → lag 3 missing → null
    val short = (0L to 3L).map(i => (2L, ts(i), i, math.pow(-1.0, i.toDouble)))
    val ev = (trend ++ short).toDF("k", "t", "tie", "v")
    val out = TimeSeriesOps.ljungBox(ev, "k", "t", "tie", "v", 3, 7.814728)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("reject"), s"trend: ${out(1L)}")
    assert(out(1L).getAs[Long]("n_lags") == 3L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("reject")), s"short: ${out(2L)}")
  }

  test("sax: word length tracks the segment count, not the series length") {
    val ev = (0L to 30L).map(i => (1L, ts(i), i, math.sin(i * 0.7)))
      .toDF("k", "t", "tie", "v")
    val w = TimeSeriesOps.sax(ev, "k", "t", "tie", "v", segments = 6)
      .collect().head.getAs[String]("sax_word")
    assert(w.length == 6 && w.forall("abcd".contains(_)), s"word: $w")
  }
}
