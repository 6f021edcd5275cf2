package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t-closeness, Benford audit, and the A/B readout: hand-computable
  * cases for the exact-integer EMD, the digit law, and the Welch-t
  * moment arithmetic.
  */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tCloseness: matching distribution gives 0; total concentration is maximal") {
    // global sensitive values {0,1}, 50/50. Group g0 mirrors it -> t=0.
    // Group g1 holds only value 0 -> cum diff |n_g*n/2| at bucket 0:
    // t = (n_g*n/2) / (n_g*n*(2-1)) = 1/2 -> 500000 micro
    val rows =
      Seq.fill(10)(("g0", 0L)) ++ Seq.fill(10)(("g0", 1L)) ++
        Seq.fill(8)(("g1", 0L)) ++
        Seq.fill(2)(("g2", 1L)) ++ Seq.fill(6)(("g2", 0L))
    val df = rows.toDF("qi", "sb")
    val out = ProfileOps.tCloseness(df, Seq("qi"), "sb")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // global: n=36, c(0)=24, c(1)=12
    // g0: n_g=20, cum0 = 10*36-24*20 = -120 -> |.|=120; t=120e6/(20*36*1)=166666
    assert(out("g0") == ((20L, 166666L)))
    // g1: n_g=8, cum0 = 8*36-24*8 = 96; t = 96e6/(8*36) = 333333
    assert(out("g1") == ((8L, 333333L)))
    // g2: n_g=8, cum0 = 6*36-24*8 = 24; t = 24e6/288 = 83333
    assert(out("g2") == ((8L, 83333L)))
  }

  test("tCloseness: single sensitive value (m=1) reports 0 for every group") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("qi", "sb")
    val out = ProfileOps.tCloseness(df, Seq("qi"), "sb")
      .collect().map(r => r.getLong(2)).toSet
    assert(out == Set(0L))
  }

  test("benfordAudit: digits counted from the integer part, spine keeps zeros") {
    // values: 123.4 (1), 19.0 (1), 2.5 (2), 0.7 (excluded), 900.1 (9)
    val df = Seq(123.4, 19.0, 2.5, 0.7, 900.1).toDF("v")
    val out = ProfileOps.benfordAudit(df, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L && out(2L) == 1L && out(9L) == 1L)
    assert((3L to 8L).forall(out(_) == 0L))
    assert(out.size == 9)
    // expected counts follow the law: digit 1 expectation ~ n*0.301
    val exp = ProfileOps.benfordAudit(df, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exp(1L) == math.round(4 * math.log10(2.0) * 1e6))
  }

  test("ksTest: identical slices D=0, a shifted slice rejects, exact rationals") {
    val same = ((1 to 100).map(i => ("a", (i % 10).toLong)) ++
      (1 to 100).map(i => ("b", (i % 10).toLong))).toDF("s", "v")
    val r0 = ProfileOps.ksTest(same, "s", "a", "b", "v").collect().head
    assert(r0.getLong(2) == 0L && !r0.getBoolean(4))
    val shifted = ((1 to 100).map(i => ("a", (i % 10).toLong)) ++
      (1 to 100).map(i => ("b", (i % 10).toLong + 5))).toDF("s", "v")
    val r1 = ProfileOps.ksTest(shifted, "s", "a", "b", "v").collect().head
    // half the mass is displaced: D = 0.5 exactly
    assert(r1.getLong(2) == 500000L, s"D was ${r1.getLong(2)}")
    assert(r1.getBoolean(4), "a half-mass shift must reject at 5%")
  }

  test("acf: an alternating series has r(1) = -1 and r(2) = +1") {
    val vals = (0 until 40).map(i => (1L, i.toLong, i.toLong,
      if (i % 2 == 0) 3.0 else 9.0))
    val df = vals.toDF("k", "ts", "seq", "v")
    val out = TimeSeriesOps.acf(df, "k", "ts", "seq", "v", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) == -1000000L, s"lag1 ${out(1L)}")
    assert(out(2L) == 1000000L, s"lag2 ${out(2L)}")
  }

  test("corrCard: perfect, inverse, and independent pairs hit exact poles") {
    val rows = (1 to 200).map { i =>
      (i.toDouble, 3.0 * i + 7.0, 100.0 - i, (i % 4).toDouble)
    }
    val df = rows.toDF("x", "y_pos", "y_neg", "y_mod")
    val out = ProfileOps.corrCard(df, Seq("x", "y_pos", "y_neg", "y_mod"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(out(("x", "y_pos")) == 1000000L)
    assert(out(("x", "y_neg")) == -1000000L)
    assert(math.abs(out(("x", "y_mod"))) < 60000L, "mod-4 is near-independent")
    assert(out(("y_pos", "y_neg")) == -1000000L)
    assert(out.size == 6)
  }

  test("degreeAssortativity: a star is -1, a clique-pair chain is positive") {
    val star = (2L to 8L).map(i => (1L, i)).toDF("a", "b")
    val rStar = GraphOps.degreeAssortativity(star, "a", "b")
      .collect().head.getLong(1)
    assert(rStar == -1000000L, s"star gave $rStar")
    // two triangles bridged: degrees {2,2,3,3,2,2} — assortativity > 0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("a", "b")
    val rTri = GraphOps.degreeAssortativity(tri, "a", "b")
      .collect().head.getLong(1)
    assert(rTri < 0L && rTri > -1000000L,
      s"bridged triangles gave $rTri (hub-bridge leans negative)")
  }

  test("allenRelation: all thirteen relations classify exactly") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // (s1, e1, s2, e2, expected)
      (0L, 2L, 5L, 8L, "precedes"),
      (0L, 5L, 5L, 8L, "meets"),
      (0L, 6L, 5L, 8L, "overlaps"),
      (5L, 8L, 5L, 9L, "starts"),
      (6L, 7L, 5L, 9L, "during"),
      (6L, 9L, 5L, 9L, "finishes"),
      (5L, 9L, 5L, 9L, "equals"),
      (5L, 9L, 5L, 8L, "started_by"),
      (5L, 9L, 6L, 7L, "contains"),
      (5L, 9L, 6L, 9L, "finished_by"),
      (6L, 9L, 5L, 7L, "overlapped_by"),
      (5L, 8L, 0L, 5L, "met_by"),
      (5L, 8L, 0L, 2L, "preceded_by"))
    val got = cases.map(c => (c._1, c._2, c._3, c._4))
      .toDF("s1", "e1", "s2", "e2")
      .select(IntervalOps.allenRelation(
        col("s1"), col("e1"), col("s2"), col("e2")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._5))
  }

  test("jsDivergence: 0 on identical slices, ln 2 on disjoint vocabularies") {
    val same = (Seq.fill(50)(("a", "x y z")) ++ Seq.fill(50)(("b", "x y z")))
      .toDF("source", "text")
    val r0 = ProfileOps.jsDivergence(same, "source", "a", "b").collect().head
    assert(r0.getLong(3) == 0L, s"identical slices gave ${r0.getLong(3)}")
    val disjoint = (Seq.fill(40)(("a", "p q")) ++ Seq.fill(40)(("b", "u v")))
      .toDF("source", "text")
    val r1 = ProfileOps.jsDivergence(disjoint, "source", "a", "b")
      .collect().head
    val ln2e12 = math.round(math.log(2.0) * 1e12)
    assert(math.abs(r1.getLong(3) - ln2e12) <= 4L,
      s"disjoint gave ${r1.getLong(3)} vs $ln2e12")
    assert(r1.getLong(2) == 4L) // vocab union p,q,u,v
  }

  test("kAnonGeneralize: small cells cascade to coarser rungs, census exact") {
    import org.apache.spark.sql.functions.col
    // rung 0: (g, v); rung 1: (g). k = 3.
    // g=a: v=1 x3 (releases at 0), v=2 x2 (cascades to rung 1, a has 5)
    // g=b: v=3 x2 -> rung 1 has only 2 -> level 2 (uncovered)
    val rows = Seq.fill(3)(("a", 1L)) ++ Seq.fill(2)(("a", 2L)) ++
      Seq.fill(2)(("b", 3L))
    val out = ProfileOps.kAnonGeneralize(rows.toDF("g", "v"),
      Seq(Seq(col("g"), col("v")), Seq(col("g"))), 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(0L -> ((3L, 1L)), 1L -> ((2L, 1L)), 2L -> ((2L, 1L))),
      out.toString)
  }

  test("reconcile: adds/removes/changes counted exactly with null safety") {
    val v1 = Seq((1L, "x", Some(1.0)), (2L, "y", Some(2.0)),
      (3L, "z", None), (4L, "w", Some(4.0))).toDF("k", "t", "v")
    val v2 = Seq((1L, "x", Some(1.0)), // unchanged
      (2L, "y", Some(9.0)), // value changed
      (3L, "q", None), // type changed, null value stays equal
      (5L, "n", Some(5.0))) // added (4 removed)
      .toDF("k", "t", "v")
    val r = ChangeOps.reconcile(v1, v2, "k", Seq("t", "v")).collect().head
    val got = (0 until 8).map(r.getLong)
    assert(got == Seq(4L, 4L, 1L, 1L, 2L, 1L, 1L, 1L),
      s"got ${got.mkString(",")}")
  }

  test("joinViewMerge: delta-rule maintenance equals the full recompute") {
    val a = (1L to 40L).map(i => (i % 12, i)).toDF("k", "av")
    val b = (1L to 60L).map(i => (i % 15, -i)).toDF("k", "bv")
    // arbitrary append split (different fractions per side)
    val (a0, da) = (a.filter($"av" <= 25), a.filter($"av" > 25))
    val (b0, db) = (b.filter($"bv" >= -20), b.filter($"bv" < -20))
    val maintained = ChangeOps.joinViewMerge(a0, da, b0, db, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupMapReduce(identity)(_ => 1)(_ + _)
    val full = a.join(b, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupMapReduce(identity)(_ => 1)(_ + _)
    assert(maintained == full)
  }

  test("bootstrapCi: brackets the true mean, deterministic under repartition") {
    val rows = (0L until 3000L).map(i => (i, (i % 100).toDouble))
    val df = rows.toDF("id", "value")
    val r1 = ExperimentOps.bootstrapCi(df, "id", "value").collect().head
    val r2 = ExperimentOps.bootstrapCi(df.repartition(7), "id", "value")
      .collect().head
    assert(r1 == r2, "CI must not depend on partitioning")
    val (lo, hi) = (r1.getLong(3), r1.getLong(4))
    val mean = r1.getLong(1)
    assert(lo < mean && mean < hi)
    // true mean 49.5e6; sigma ~28.9 -> CI roughly +-2.1*28.9/sqrt(3000)
    assert(lo > 48000000L && hi < 51000000L, s"[$lo, $hi] implausible")
    assert(r1.getLong(0) == 3000L && r1.getLong(2) == 64L)
  }

  test("bootstrapCi: empty input yields zero rows, not a null row") {
    val df = Seq.empty[(Long, Double)].toDF("id", "value")
    assert(ExperimentOps.bootstrapCi(df, "id", "value").count() == 0L)
  }

  test("abLift: moments and Welch t replay the exact formula") {
    // arms decided by md5(user); compute expected from the same split
    import java.security.MessageDigest
    def draw(u: Long): Long = {
      val h = MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        h.take(2).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val rows = (0L until 200L).map(i => (i, (i % 13).toDouble + 0.5))
    val df = rows.toDF("user_id", "value")
    val r = ExperimentOps.abLift(df, "user_id", "value").collect().head
    val (as, bs) = rows.partition { case (u, _) => draw(u) < 32768L }
    def s1(xs: Seq[Double]) = xs.map(BigDecimal(_)).sum.toDouble
    def s2(xs: Seq[Double]) =
      xs.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble
    val (va, vb) = (as.map(_._2), bs.map(_._2))
    assert(r.getLong(0) == va.length.toLong && r.getLong(1) == vb.length.toLong)
    val ma = s1(va) / va.length
    val mb = s1(vb) / vb.length
    assert(r.getLong(2) == math.rint(ma * 1e6).toLong ||
      r.getLong(2) == BigDecimal(ma * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val sa = (s2(va) - s1(va) * s1(va) / va.length) / (va.length - 1)
    val sb = (s2(vb) - s1(vb) * s1(vb) / vb.length) / (vb.length - 1)
    val t = (ma - mb) / math.sqrt(sa / va.length + sb / vb.length)
    val tMicro = BigDecimal(t * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(r.getLong(5) == tMicro, s"${r.getLong(5)} vs $tMicro")
  }
}
