package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class RollingZScoreSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // (key, ts, seq, value) rows with seq doubling as a unique id
  private def score(rows: Seq[(Long, Long, Long, Double)],
      windowN: Int = 20, thr: Long = 3000000L) =
    TimeSeriesOps.rollingZScore(
      rows.toDF("k", "ts", "seq", "v"), "k", "ts", "seq", "v",
      windowN, thr)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .toMap

  /** The op's exact double recipe on a trailing window + current value. */
  private def expectedZ(prior: Seq[Double], v: Double): Long = {
    val n = prior.size.toDouble
    val s1 = prior.map(x => BigDecimal(x).setScale(6)).sum.toDouble
    val s2 = prior.map(x => BigDecimal(x).setScale(6).pow(2)).sum.toDouble
    val variance = (s2 - s1 * s1 / n) / (n - 1.0)
    BigDecimal((v - s1 / n) / math.sqrt(variance) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("warm-up rows are unscored; scored rows match the exact recipe") {
    val prior = (0 until 20).map(i => if (i % 2 == 0) 1.0 else 3.0)
    val rows = prior.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v)
    } :+ (1L, 20L, 20L, 10.0)
    val out = score(rows)
    assert(out.keySet == Set(20L), "only the 21st row has a full window")
    assert(out(20L) == ((expectedZ(prior, 10.0), 1L)))
  }

  test("a value at the trailing mean scores zero and is not an anomaly") {
    val prior = (0 until 20).map(i => if (i % 2 == 0) 1.0 else 3.0)
    val rows = prior.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v)
    } :+ (1L, 20L, 20L, 2.0)
    assert(score(rows)(20L) == ((0L, 0L)))
  }

  test("a constant trailing window (zero variance) is never scored") {
    val rows = (0 until 25).map(i => (1L, i.toLong, i.toLong, 5.0)) :+
      (1L, 25L, 25L, 100.0)
    assert(score(rows).isEmpty)
  }

  test("keys are independent and short keys never divide by zero") {
    val k1 = (0 until 21).map(i =>
      (1L, i.toLong, i.toLong, if (i < 20) i.toDouble % 5 else 50.0))
    val k2 = Seq((2L, 0L, 100L, 1.0)) // 1 row: n=0 frame
    val k3 = Seq((3L, 0L, 200L, 1.0), (3L, 1L, 201L, 2.0)) // n=1 frame
    val out = score(k1 ++ k2 ++ k3)
    assert(out.keySet == Set(20L))
    assert(out(20L)._2 == 1L)
  }

  test("threshold boundary: |z| exactly at the cut flags, below does not") {
    val prior = (0 until 20).map(i => if (i % 2 == 0) 1.0 else 3.0)
    val rows = prior.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v)
    } :+ (1L, 20L, 20L, 10.0)
    val z = expectedZ(prior, 10.0)
    assert(score(rows, thr = z)(20L)._2 == 1L)
    assert(score(rows, thr = z + 1)(20L)._2 == 0L)
  }
}
