package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofJoinPrior picks the greatest right ts <= left ts, per key") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("key", "ts_us", "tag")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 60L, 30L))
      .toDF("key", "rts", "v")
    val out = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("key", "ts_us", "tag", "asof_ts", "v")
      .as[(Long, Long, String, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      (1L, 100L, "a", Some(100L), Some(10L)), // tie is inclusive
      (1L, 250L, "b", Some(200L), Some(20L)), // most recent prior wins
      (2L, 50L, "c", None, None)))            // nothing at-or-before → null
  }

  test("asofJoinPrior does not leak values across keys") {
    val left = Seq((1L, 500L), (2L, 500L)).toDF("key", "ts_us")
    val right = Seq((1L, 400L, 7L)).toDF("key", "rts", "v")
    val out = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("key", "v").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out === Array((1L, Some(7L)), (2L, None)))
  }

  test("asofJoinPrior keeps the matched row's null value (no stale patch-through)") {
    val left = Seq((1L, 150L)).toDF("key", "ts_us")
    val right = Seq((1L, 50L, Some(7L)), (1L, 100L, None))
      .toDF("key", "rts", "v")
    val out = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("asof_ts", "v").as[(Option[Long], Option[Long])].collect()
    // the match is the rts=100 row, whose v IS null — not rts=50's v=7
    assert(out === Array((Some(100L), None)))
  }

  test("asofJoinPrior treats null keys as join keys do: never equal") {
    val left = Seq((Option.empty[Long], 100L), (Some(1L), 100L)).toDF("key", "ts_us")
    val right = Seq((Option.empty[Long], 50L, 9L), (Some(1L), 50L, 5L)).toDF("key", "rts", "v")
    val out = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("key", "v").as[(Option[Long], Option[Long])].collect().toSet
    assert(out === Set((None, None), (Some(1L), Some(5L))))
  }

  test("null timestamps never match, in either direction") {
    // right row with null rts must not be carried into no-match lefts
    val left = Seq((1L, Some(100L)), (1L, Option.empty[Long])).toDF("key", "ts_us")
    val right = Seq((1L, Option.empty[Long], 9L)).toDF("key", "rts", "v")
    val prior = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("v").as[Option[Long]].collect().toSeq
    assert(prior == Seq(None, None)) // both lefts preserved, no fabricated match
    val next = JoinOps.asofJoinNext(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("v").as[Option[Long]].collect().toSeq
    assert(next == Seq(None, None))
    // null LEFT ts with a real right row: left row kept, still no match
    val right2 = Seq((1L, Some(50L), 7L)).toDF("key", "rts", "v")
    val next2 = JoinOps.asofJoinNext(left, right2, "key", "ts_us", "rts", Seq("v"))
      .select("ts_us", "v").as[(Option[Long], Option[Long])].collect().toSet
    assert(next2 == Set((Some(100L), None), (None, None)))
  }

  test("asofJoinPrior rejects left columns that collide with output names") {
    val left = Seq((1L, 100L, 0L)).toDF("key", "ts_us", "asof_ts")
    val right = Seq((1L, 50L, 9L)).toDF("key", "rts", "v")
    assertThrows[IllegalArgumentException](
      JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v")))
  }

  test("rangeJoinBinned equals the broadcast range join on random data") {
    val rnd = new scala.util.Random(7)
    val facts = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("fact_id", "ts")
    val ivs = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(9500).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(800).toLong)
    }.toDF("iv_id", "iv_start", "iv_end")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
    val broadcastJoin = pairs(JoinOps.rangeJoin(facts, ivs, "ts"))
    // binWidth much smaller AND larger than typical interval spans
    assert(pairs(JoinOps.rangeJoinBinned(facts, ivs, "ts", 64L)) == broadcastJoin)
    assert(pairs(JoinOps.rangeJoinBinned(facts, ivs, "ts", 4096L)) == broadcastJoin)
  }

  test("rangeJoinBinned bin edges: exclusive end, empty intervals dropped") {
    val facts = Seq((1L, 100L), (2L, 128L), (3L, 199L), (4L, 200L)).toDF("fact_id", "ts")
    val ivs = Seq(
      (10L, 100L, 200L), // [100,200): facts 1,2,3 — not 4
      (11L, 64L, 128L),  // ends ON a bin edge (width 64): fact 1 only
      (12L, 300L, 300L)  // empty: must not throw or match
    ).toDF("iv_id", "iv_start", "iv_end")
    val got = JoinOps.rangeJoinBinned(facts, ivs, "ts", 64L)
      .select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)))
  }

  test("asofJoinNext picks the earliest right row at-or-after, inclusive") {
    val left = Seq((1L, 100L), (1L, 151L), (2L, 100L)).toDF("key", "ts_us")
    val right = Seq((1L, 100L, 5L), (1L, 150L, 7L)).toDF("key", "rts", "v")
    val out = JoinOps.asofJoinNext(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("key", "ts_us", "asof_ts", "v")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(out === Set(
      (1L, 100L, Some(100L), Some(5L)), // equal ts matches (inclusive)
      (1L, 151L, None, None),           // nothing at-or-after 151
      (2L, 100L, None, None)))          // no right rows for key 2
  }

  test("asofJoinNext matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(43)
    val leftRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rightRows = Seq.tabulate(80)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 7 % 997, i.toLong * 10))
      .distinctBy(r => (r._1, r._2)) // unique (key, ts) per contract
    val left = leftRows.toDF("key", "ts_us", "lid")
    val right = rightRows.toDF("key", "rts", "v")
    val got = JoinOps.asofJoinNext(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("lid", "asof_ts", "v")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    leftRows.foreach { case (k, ts, lid) =>
      val next = rightRows.filter(r => r._1 == k && r._2 >= ts)
        .sortBy(_._2).headOption
      assert(got(lid) === ((next.map(_._2), next.map(_._3))), s"lid=$lid")
    }
  }

  test("asofJoinPrior matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(120).toLong, i.toLong))
    val rightRows = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(120).toLong))
      .distinct // unique (key, ts): the operator's documented contract
      .map { case (k, t) => (k, t, k * 1000 + t) }
    val left = leftRows.toDF("key", "ts_us", "lid")
    val right = rightRows.toDF("key", "rts", "v")

    val got = JoinOps.asofJoinPrior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("lid", "asof_ts", "v")
      .as[(Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq

    val byKey = rightRows.groupBy(_._1)
    val exp = leftRows.sortBy(_._3).map { case (k, ts, lid) =>
      byKey.getOrElse(k, Nil).filter(_._2 <= ts) match {
        case Nil => (lid, None, None)
        case xs => val m = xs.maxBy(_._2); (lid, Some(m._2), Some(m._3))
      }
    }
    assert(got === exp)
  }

  test("asofJoinPriorBucketed: carry crosses empty buckets; boundary ties stay inclusive") {
    // bucketWidth=100: right at ts=95 (bucket 0) must reach left rows in
    // buckets 2 and 3 across the empty bucket 1; right at ts=300 sits ON
    // a bucket boundary and matches a left row at the same ts
    val left = Seq(
      (1L, 250L, "a"), (1L, 300L, "b"), (1L, 399L, "c"), (1L, 50L, "d"),
      (2L, 500L, "e") // key with no right rows at all
    ).toDF("key", "ts_us", "tag")
    val right = Seq((1L, 95L, 10L), (1L, 300L, 30L))
      .toDF("key", "rts", "v")
    val out = JoinOps
      .asofJoinPriorBucketed(left, right, "key", "ts_us", "rts", Seq("v"), 100L)
      .select("key", "ts_us", "tag", "asof_ts", "v")
      .as[(Long, Long, String, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      (1L, 50L, "d", None, None),            // before any right row
      (1L, 250L, "a", Some(95L), Some(10L)), // carried across empty bucket 1
      (1L, 300L, "b", Some(300L), Some(30L)),// boundary tie is inclusive
      (1L, 399L, "c", Some(300L), Some(30L)),// in-bucket prior beats carry
      (2L, 500L, "e", None, None)))
  }

  test("asofJoinPriorBucketed equals asofJoinPrior on real tables, any width") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.etl.Ingest.table(spark, dir, "events").select(
      col("event_id"), col("user_id").as("key"),
      unix_micros(col("ts")).as("ts_us"))
    val day = graft.etl.Ingest.table(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"),
        unix_micros(col("o_orderdate")).as("ots"))
      .agg(count(lit(1)).as("day_orders"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "key", "ts_us", "asof_ts", "day_orders")
      .as[(Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val base = rows(JoinOps.asofJoinPrior(ev, day, "key", "ts_us", "ots", Seq("day_orders")))
    for (width <- Seq(86400000000L, 604800000000L)) { // 1 day, 7 days
      val bucketed = rows(JoinOps.asofJoinPriorBucketed(
        ev, day, "key", "ts_us", "ots", Seq("day_orders"), width))
      assert(bucketed === base, s"width=$width diverged")
    }
  }

  test("rangeJoin keeps rows inside [start, end) only") {
    val facts = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L))
      .toDF("id", "ts_us")
    val iv = Seq((0L, 10L, 20L)).toDF("iv_id", "iv_start", "iv_end")
    val ids = JoinOps.rangeJoin(facts, iv, "ts_us")
      .select("id").as[Long].collect().sorted
    assert(ids === Array(2L, 3L)) // 10 in, 19 in, 20 out (exclusive end)
  }

  test("asofJoinPriorTolerance: inclusive boundary, stale matches null out whole") {
    val left = Seq(
      (1L, 10L, 110L), // gap 10 == tolerance: match survives
      (1L, 20L, 131L), // gap 11 > tolerance: expired
      (2L, 99L, 50L))  // no prior at all
      .toDF("k", "lid", "lts")
      .select(col("k"), col("lid"), col("lts"))
    val right = Seq((1L, 100L, 7L), (1L, 120L, 8L))
      .toDF("k", "rts", "v")
    val out = JoinOps.asofJoinPriorTolerance(
      left, right, "k", "lts", "rts", Seq("v"), toleranceUs = 10L)
      .collect().map(r => r.getAs[Long]("lid") ->
        (Option(r.getAs[Any]("asof_ts")), Option(r.getAs[Any]("v"))))
      .toMap
    assert(out(10L) == ((Some(100L), Some(7L))))
    // expiry nulls the timestamp AND the value together — a half-nulled
    // row would silently pair a value with no provenance
    assert(out(20L) == ((None, None)))
    assert(out(99L) == ((None, None)))
  }
}
