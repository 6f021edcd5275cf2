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

  test("holtWintersSmooth equals the plain-Scala triple fold; seasonality absorbs a cycle") {
    import spark.implicits._
    def r(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    def replay(vs: Seq[Double], p: Int): Seq[(Long, Long, Long)] = {
      var lvl = 0L; var trd = 0L; var started = false
      val seas = Array.fill(p)(0L)
      vs.zipWithIndex.map { case (v, t) =>
        val slot = t % p
        val y6 = math.rint(v * 1e6) // round() of an exact 6dp value
        val nl = if (!started) y6.toLong
          else r(0.5 * (y6 - seas(slot).toDouble) + 0.5 * (lvl + trd).toDouble)
        trd = if (!started) 0L
          else r(0.5 * (nl - lvl).toDouble + 0.5 * trd.toDouble)
        val ns = r(0.5 * (y6 - nl.toDouble) + 0.5 * seas(slot).toDouble)
        lvl = nl; seas(slot) = ns; started = true
        (lvl, trd, ns)
      }
    }
    val vs = Seq(3.0, 9.5, 2.25, 8.0, 4.0, 10.0, 1.5, 7.75)
    val ev = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "seq", "v")
    val got = TimeSeriesOps.holtWintersSmooth(ev, "k", "ts", "seq", "v",
      period = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).map(_._2).toSeq
    assert(got == replay(vs, 2))
    // on a pure 2-cycle the seasonal slots absorb the swing: the last
    // seasonal states approach +-half the amplitude around the level
    val cyc = (0 until 40).map(i => if (i % 2 == 0) 10.0 else 20.0)
    val cev = cyc.zipWithIndex.map { case (v, i) => (2L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "seq", "v")
    val tail2 = TimeSeriesOps.holtWintersSmooth(cev, "k", "ts", "seq", "v", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).sortBy(_._1)
      .takeRight(2).map(_._2)
    assert(tail2.exists(_ < -3000000L) && tail2.exists(_ > 3000000L),
      s"seasonal slots ${tail2.mkString(",")} did not split the cycle")
  }

  test("runsTest: alternation maximizes runs, a trend minimizes them") {
    import spark.implicits._
    // alternating 1, 9 over 20 points: 20 runs (max), z strongly positive
    val alt = (0 until 20).map(i =>
      (1L, i.toLong, i.toLong, if (i % 2 == 0) 1.0 else 9.0))
    // trend: 10 lows then 10 highs -> 2 runs, z strongly negative
    val trend = (0 until 20).map(i =>
      (2L, i.toLong, i.toLong, if (i < 10) 1.0 else 9.0))
    // constant: one sign only -> filtered out
    val const = (0 until 5).map(i => (3L, i.toLong, i.toLong, 4.0))
    val df = (alt ++ trend ++ const).toDF("k", "ts", "seq", "v")
    val out = TimeSeriesOps.runsTest(df, "k", "ts", "seq", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._3 == 20L && out(1L)._4 > 3000000L,
      s"alternation gave ${out(1L)}")
    assert(out(2L)._3 == 2L && out(2L)._4 < -3000000L,
      s"trend gave ${out(2L)}")
    assert(!out.contains(3L))
    // both keys split 10/10 above/below the mean
    assert(out(1L)._1 == 10L && out(2L)._1 == 10L)
  }

  test("cusumChangepoint finds a level shift at the shift, exact and tie-stable") {
    import spark.implicits._
    // key 1: 5 points at 10 then 5 points at 20 -> cusum peaks at t=5
    val shift = (1 to 10).map(i => (1L, i.toLong, if (i <= 5) 10L else 20L))
    // key 2: constant series -> every cusum is 0, tie -> earliest t=1
    val flat = (1 to 4).map(i => (2L, i.toLong, 7L))
    // key 3: single point -> excluded (no interior position)
    val single = Seq((3L, 1L, 99L))
    val df = (shift ++ flat ++ single).toDF("k", "ts", "x").repartition(5)
    val got = TimeSeriesOps.cusumChangepoint(df, "k", "ts", "x")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // key 1: n=10, S=150; cusum_5 = (5*10)*10 - 5*150 = -250
    assert(got(1L) == ((10L, 150L, 5L, 5L, 250L)))
    assert(got(2L) == ((4L, 28L, 1L, 1L, 0L)))
    assert(!got.contains(3L))
    // scaled cusum has the same argmax as the mean-subtracted one
    val xs = shift.map(_._3.toDouble)
    val mean = xs.sum / xs.length
    val classic = xs.scanLeft(0.0)(_ + _ - mean).tail.dropRight(1)
    assert(classic.map(math.abs).zipWithIndex.maxBy(_._1)._2 + 1 == 5)
  }

  test("holtSmooth equals the plain-Scala two-state fold; trend tracks a ramp") {
    import spark.implicits._
    // Spark/DuckDB round() is half AWAY FROM ZERO (math.round is
    // floor(x+0.5), which disagrees at negative halves)
    def r(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    def replay(vs: Seq[Double]): Seq[(Long, Long)] = {
      var lvl = 0L; var trd = 0L; var started = false
      vs.map { v =>
        if (!started) { lvl = r(v * 1e6); trd = 0L; started = true }
        else {
          val nl = r(0.5 * v * 1e6 + 0.5 * (lvl + trd).toDouble)
          trd = r(0.5 * (nl - lvl).toDouble + 0.5 * trd.toDouble)
          lvl = nl
        }
        (lvl, trd)
      }
    }
    val vs = Seq(3.0, 7.5, 2.25, 9.0, 4.125, 8.0, 1.0, 6.5)
    val ev = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "seq", "v")
    val got = TimeSeriesOps.holtSmooth(ev, "k", "ts", "seq", "v")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .sortBy(_._1).map(_._2).toSeq
    assert(got == replay(vs))
    // on a pure ramp v_t = t the trend converges toward the slope (1e6)
    // and the one-step forecast l+b approaches the next value
    val ramp = (0 until 40).map(_.toDouble)
    val rampEv = ramp.zipWithIndex.map { case (v, i) => (2L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "seq", "v")
    val last = TimeSeriesOps.holtSmooth(rampEv, "k", "ts", "seq", "v")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .sortBy(_._1).last
    val (lvl39, trd39) = last._2
    assert(math.abs(trd39 - 1000000L) < 20000L, s"trend $trd39 far from slope")
    assert(math.abs((lvl39 + trd39) - 40L * 1000000L) < 40000L,
      s"forecast ${lvl39 + trd39} far from 40e6")
  }
}
