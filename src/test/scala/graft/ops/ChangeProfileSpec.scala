package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeProfileSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("latestSnapshot picks the (ord, tie)-max row per key, equal to the window form") {
    val log = Seq(
      // (key, ts, id, state, v)
      (1L, 10L, 1L, "a", 1.0), (1L, 20L, 2L, "b", 2.0), (1L, 20L, 3L, "c", 3.0),
      (2L, 5L, 4L, "x", 9.0),
      (3L, 7L, 5L, "m", 0.5), (3L, 6L, 6L, "n", 0.7)
    ).toDF("k", "ts", "id", "state", "v")
    val snap = ChangeOps.latestSnapshot(log, Seq("k"), Seq("ts", "id"), Seq("state", "v"))
      .orderBy("k").collect()
    assert(snap.toSeq == Seq(
      Row(1L, 20L, 3L, "c", 3.0),   // equal ts=20 → higher id wins
      Row(2L, 5L, 4L, "x", 9.0),
      Row(3L, 7L, 5L, "m", 0.5)))   // later ts wins despite higher id on the other row
    // agreement with the row_number formulation on the same data
    val w = Window.partitionBy("k").orderBy(col("ts").desc, col("id").desc)
    val viaWindow = log.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("k", "ts", "id", "state", "v").orderBy("k").collect()
    assert(snap.toSeq == viaWindow.toSeq)
  }

  test("latestSnapshot plans a partial+final aggregate, not a per-key sort") {
    val log = Seq((1L, 10L, 1L, "a", 1.0)).toDF("k", "ts", "id", "state", "v")
    val p = ChangeOps.latestSnapshot(log, Seq("k"), Seq("ts", "id"), Seq("state", "v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window"))
  }

  test("scd2 produces gapless validity intervals, open tail, deterministic ties") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 3L, "c"), (1L, 20L, 2L, "b"),
      (2L, 5L, 4L, "x")
    ).toDF("k", "ts", "id", "state")
    val hist = ChangeOps.scd2(log, Seq("k"), "ts", "id")
      .select("k", "id", "valid_from", "valid_to").orderBy("k", "valid_from", "id")
      .collect()
    assert(hist.toSeq == Seq(
      Row(1L, 1L, 10L, 20L),
      Row(1L, 2L, 20L, 20L),  // tie on ts=20: id 2 precedes id 3, zero-width interval
      Row(1L, 3L, 20L, null),
      Row(2L, 4L, 5L, null)))
  }

  test("applyChanges covers all four MERGE cases and keeps only the winning change") {
    val snapshot = Seq(
      (1L, "old-a"), (2L, "old-b"), (3L, "old-c")
    ).toDF("k", "state")
    val changes = Seq(
      // (key, ts, id, op, state)
      (1L, 10L, 1L, "upsert", "new-a1"),
      (1L, 20L, 2L, "upsert", "new-a2"),   // later change wins
      (2L, 10L, 3L, "delete", "ignored"),  // delete existing
      (4L, 10L, 4L, "upsert", "new-d"),    // insert new key
      (5L, 10L, 5L, "delete", "ignored"),  // delete absent key: no-op
      (6L, 10L, 6L, "upsert", "short"),
      (6L, 20L, 7L, "delete", "ignored")   // upsert then delete → gone
    ).toDF("k", "ts", "id", "op", "state")
    val next = ChangeOps.applyChanges(snapshot, changes,
      keyCols = Seq("k"), ordCols = Seq("ts", "id"), payloadCols = Seq("state"))
      .as[(Long, String)].collect().toMap
    assert(next == Map(
      1L -> "new-a2", // updated, latest change
      3L -> "old-c",  // untouched passthrough
      4L -> "new-d")) // inserted
    // empty changelog → snapshot unchanged; empty snapshot → upserts only
    val noCh = Seq.empty[(Long, Long, Long, String, String)]
      .toDF("k", "ts", "id", "op", "state")
    assert(ChangeOps.applyChanges(snapshot, noCh, Seq("k"), Seq("ts", "id"),
      Seq("state")).count() == 3)
    val noSnap = Seq.empty[(Long, String)].toDF("k", "state")
    assert(ChangeOps.applyChanges(noSnap, changes, Seq("k"), Seq("ts", "id"),
      Seq("state")).as[(Long, String)].collect().toMap ==
      Map(1L -> "new-a2", 4L -> "new-d"))
  }

  test("mergeSummaries: any split of the facts merges to the full recompute") {
    val facts = Seq(
      (1L, 1.5), (1L, 2.25), (1L, -0.5), (1L, 4.0),
      (2L, 10.0), (2L, 10.0),
      (3L, 0.3333333)) // rounds to 333333 micro
    def summary(rows: Seq[(Long, Double)]) =
      ChangeOps.microSummary(rows.toDF("k", "v"), Seq("k"), "v")
    val full = ChangeOps.mergeSummaries(Seq(summary(facts)), Seq("k"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(full(1L) == ((4L, 7250000L, -500000L, 4000000L, 1812500L)))
    assert(full(2L) == ((2L, 20000000L, 10000000L, 10000000L, 10000000L)))
    assert(full(3L) == ((1L, 333333L, 333333L, 333333L, 333333L)))
    // every 2-way split (including key-disjoint and empty delta) merges
    // to exactly the same summary — the algebraic identity
    for (cut <- 0 to facts.size) {
      val (a, b) = facts.splitAt(cut)
      val merged = ChangeOps.mergeSummaries(
        Seq(summary(a), summary(b)), Seq("k"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))
        .toMap
      assert(merged == full, s"split at $cut diverged")
    }
  }

  test("profile counts nulls, distincts, min/max per column") {
    val df = Seq(
      (Some(1L), Some("b"), Some(2.5)),
      (Some(1L), None, Some(1.25)),
      (None, Some("a"), Some(2.5))
    ).toDF("k", "s", "v")
    val prof = ProfileOps.profile(df, Seq("k", "s", "v"))
      .orderBy("col_name").collect()
    assert(prof.toSeq == Seq(
      Row("k", 1L, 1L, "1", "1"),
      Row("s", 1L, 2L, "a", "b"),
      Row("v", 0L, 2L, "1.250000", "2.500000")))  // doubles through DECIMAL(18,6)
    // per-column branches union — no join, and no Expand row duplication
    val p = ProfileOps.profile(df, Seq("k", "s", "v")).queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Expand"))
  }

  test("constraintSuite: one-pass metrics, thresholds, fail-closed on empty") {
    val df = Seq(
      (1L, Some("a"), 5.0),
      (2L, Some("a"), 50.0),
      (3L, None, 500.0),
      (3L, Some("b"), 5.0)
    ).toDF("id", "s", "v")
    def suite(d: org.apache.spark.sql.DataFrame) =
      ProfileOps.constraintSuite(d, Seq(
        ("id_unique", ProfileOps.uniqueness(col("id")), 1.0),
        ("s_complete", ProfileOps.completeness(col("s")), 0.5),
        ("v_small", ProfileOps.satisfaction(col("v") < 100), 0.9)))
    val out = suite(df).orderBy("check_name").collect()
      .map(r => (r.getString(0), r.get(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("id_unique", 0.75, 0L),   // 3 distinct / 4 rows
      ("s_complete", 0.75, 1L),
      ("v_small", 0.75, 0L)))
    // the whole suite is ONE aggregation over the input: a single scan
    // (single distinct rewrites two-phase, no Expand), no self-joins
    val p = suite(df).queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Expand"))
    // empty input: metrics unobservable (null) → every rule FAILS closed
    val empty = suite(df.filter(lit(false))).collect()
    assert(empty.length == 3 && empty.forall(r => r.isNullAt(1) && r.getLong(3) == 0L))
  }

  test("kAnonymize: cells under k are suppressed, counts nulled") {
    import spark.implicits._
    val df = (Seq.fill(3)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) ++
      Seq.fill(5)(("de", "s1"))).toDF("lang", "source")
    val out = ProfileOps.kAnonymize(df, Seq("lang", "source"), 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(out(("en", "s1")) == ((true, Some(3L))))
    assert(out(("en", "s2")) == ((false, None)), "a 2-cell must suppress")
    assert(out(("de", "s1")) == ((true, Some(5L))))
    assertThrows[IllegalArgumentException] {
      ProfileOps.kAnonymize(df, Seq.empty, 3)
    }
  }

  test("lDiversity: homogeneous cells suppress even above k, diverse ones release") {
    val rows = Seq(
      // cell A: 6 rows but ONE sensitive value — k-anon would release it
      ("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L),
      // cell B: 3 rows, 3 distinct values — l=3 releases
      ("b", 1L), ("b", 2L), ("b", 3L),
      // cell C: 4 rows, 2 distinct — below l
      ("c", 1L), ("c", 1L), ("c", 2L), ("c", 2L)
    ).toDF("q", "s")
    val out = ProfileOps.lDiversity(rows, Seq("q"), "s", 3L)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("a") == ((false, None, None)))
    assert(out("b") == ((true, Some(3L), Some(3L))))
    assert(out("c") == ((false, None, None)))
    // contrast: k-anonymity at k=4 happily releases the homogeneous cell
    val ka = ProfileOps.kAnonymize(rows, Seq("q"), 4L)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ka("a") && !ka("b"))
  }

  test("zipfSlope matches a plain-Scala OLS replay; degenerate source reports 0") {
    import spark.implicits._
    // s1: counts 12/6/4/3 = 12/r over ranks 1..4 (an exact r^−1 law);
    // s2: exponential decay (much steeper); s3: a single term — no line
    val docs = Seq(
      (0L, ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim, "s1"),
      (1L, ("x " * 27 + "y " * 3 + "z").trim, "s2"),
      (2L, "solo solo solo", "s3")
    ).toDF("doc_id", "text", "source")
    val out = ProfileOps.zipfSlope(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def replay(counts: Seq[Long]): Long = {
      def mln(v: Double) =
        BigDecimal(math.log(v) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val xy = counts.sorted(Ordering[Long].reverse).zipWithIndex
        .map { case (c, i) => (mln(i + 1.0), mln(c.toDouble)) }
      val n = xy.length.toDouble
      val (sx, sy) = (xy.map(_._1).sum.toDouble, xy.map(_._2).sum.toDouble)
      val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
      val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
      math.floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6).toLong
    }
    assert(out("s1") == ((4L, replay(Seq(12L, 6L, 4L, 3L)))))
    assert(out("s2") == ((3L, replay(Seq(27L, 3L, 1L)))))
    assert(out("s3") == ((1L, 0L)))
    // the exact 12/r law fits slope −1 (up to the micro-ln rounding)
    assert(math.abs(out("s1")._2 + 1000000L) < 2000L, out("s1").toString)
    assert(out("s2")._2 < out("s1")._2, "steeper decay → more negative slope")
  }

  test("datasetChecksum: order/partition invariant, any field change detected") {
    val rows = (1L to 200L).map(i => (i, s"g${i % 3}", s"payload-$i"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      ProfileOps.datasetChecksum(df, "g", Seq("id", "g", "pay"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val base = sum(rows.toDF("id", "g", "pay"))
    val shuffled = sum(rows.reverse.toDF("id", "g", "pay").repartition(7))
    assert(base == shuffled, "checksum must not depend on order or layout")
    // flip one character in one row: only that row's group moves
    val tweaked = sum(rows.map { case (i, g, p) =>
      (i, g, if (i == 57L) p + "!" else p)
    }.toDF("id", "g", "pay"))
    val changedGroup = "g" + (57L % 3)
    assert(tweaked(changedGroup) != base(changedGroup))
    assert(tweaked.filter(_._1 != changedGroup) ==
      base.filter(_._1 != changedGroup))
    // checksums stay inside the 48-bit modulus
    assert(base.values.forall { case (_, c) =>
      c >= 0L && c < ProfileOps.ChecksumMod })
  }
}
