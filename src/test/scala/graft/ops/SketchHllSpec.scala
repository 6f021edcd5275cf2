package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HLL registers/estimate and KMV set algebra: exact-integer rank
  * arithmetic, partition independence, mergeability, and the estimator
  * error regimes the Scaladoc promises.
  */
class SketchHllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hllIdx/hllRank: exact splits of crafted 32-bit draws") {
    // (draw, expected idx, expected rank): remainder w is the low 26
    // bits; rank = 27 - bitlen(w), capped at 27 when w = 0.
    val cases = Seq(
      (0L, 0L, 27L), // all zero: cap
      (1L, 0L, 26L), // w = 1 -> bitlen 1
      ((1L << 26) - 1, 0L, 1L), // w all ones -> bitlen 26
      (1L << 26, 1L, 27L), // idx bit set, w = 0
      (0xFFFFFFFFL, 63L, 1L), // max draw
      ((5L << 26) | 1024L, 5L, 16L) // w = 2^10 -> bitlen 11
    )
    val df = cases.map(_._1).toDF("h")
      .select(col("h"), SketchOps.hllIdx(col("h")).as("idx"),
        SketchOps.hllRank(col("h")).as("rank"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == cases)
  }

  test("registers are partition-independent and merge by max") {
    val vals = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    val whole = SketchOps.hllRegisters(vals, Seq("g"), col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val shuffled = SketchOps.hllRegisters(vals.repartition(7), Seq("g"), col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(whole == shuffled, "registers must not depend on partitioning")
    // merge: registers of two disjoint halves, max-merged per idx
    val a = SketchOps.hllRegisters(
      vals.filter(substring(col("v"), 2, 10).cast("int") <= 1500),
      Seq("g"), col("v"))
    val b = SketchOps.hllRegisters(
      vals.filter(substring(col("v"), 2, 10).cast("int") > 1500),
      Seq("g"), col("v"))
    val merged = a.unionAll(b)
      .groupBy("g", "idx").agg(max("max_rank").as("max_rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(merged == whole, "slice registers max-merge to the whole's")
  }

  test("estimate lands inside the raw-HLL error regime (m=64 -> ~13% SE)") {
    val n = 5000
    val vals = (1 to n).map(i => ("g", s"key-$i")).toDF("g", "v")
    val est = SketchOps.hllEstimate(
      SketchOps.hllRegisters(vals, Seq("g"), col("v")), Seq("g"))
      .select(col("est_micro")).as[Long].head()
    val rel = math.abs(est / 1e6 - n) / n
    // 3 sigma of the 1.04/sqrt(64) standard error
    assert(rel < 0.39, s"relative error $rel out of regime (est=$est)")
  }

  test("estimate is duplicate-insensitive (a multiset sketches its set)") {
    val once = (1 to 2000).map(i => ("g", s"k$i")).toDF("g", "v")
    val thrice = (1 to 2000).flatMap(i => Seq.fill(3)(("g", s"k$i"))).toDF("g", "v")
    val e1 = SketchOps.hllEstimate(
      SketchOps.hllRegisters(once, Seq("g"), col("v")), Seq("g"))
      .select("est_micro").as[Long].head()
    val e3 = SketchOps.hllEstimate(
      SketchOps.hllRegisters(thrice, Seq("g"), col("v")), Seq("g"))
      .select("est_micro").as[Long].head()
    assert(e1 == e3)
  }

  test("kmvSetOps: identical sets give rho=k, jaccard=1, est_inter=est_union") {
    val a = (1 to 1000).map(i => s"x$i").toDF("v")
    val r = SketchOps.kmvSetOps(a, a, 64).collect().head
    val get = (n: String) => r.getLong(r.fieldIndex(n))
    assert(get("rho") == 64L)
    assert(get("est_jaccard_ppm") == 1000000L)
    assert(get("exact_jaccard_ppm") == 1000000L)
    assert(get("est_a") == get("est_b"))
    assert(get("est_inter") == get("est_union"))
    assert(get("exact_inter") == 1000L)
  }

  test("kmvSetOps: disjoint sets give zero intersection estimates") {
    val a = (1 to 800).map(i => s"a$i").toDF("v")
    val b = (1 to 800).map(i => s"b$i").toDF("v")
    val r = SketchOps.kmvSetOps(a, b, 64).collect().head
    val get = (n: String) => r.getLong(r.fieldIndex(n))
    assert(get("exact_inter") == 0L)
    assert(get("exact_union") == 1600L)
    // rho CAN be nonzero only if a digest is in both synopses - impossible
    // for disjoint value sets (md5 is injective on these inputs)
    assert(get("rho") == 0L && get("est_inter") == 0L)
  }

  test("kmvSetOps: estimates track exact cardinalities within the k=128 regime") {
    val a = (1 to 3000).map(i => s"v$i").toDF("v")
    val b = (1500 to 4500).map(i => s"v$i").toDF("v") // 50% overlap with a
    val r = SketchOps.kmvSetOps(a.repartition(5), b.repartition(3), 128)
      .collect().head
    val get = (n: String) => r.getLong(r.fieldIndex(n))
    def relErr(est: Long, exact: Long) = math.abs(est - exact).toDouble / exact
    assert(relErr(get("est_a"), get("exact_a")) < 0.3)
    assert(relErr(get("est_b"), get("exact_b")) < 0.3)
    assert(relErr(get("est_union"), get("exact_union")) < 0.3)
    // jaccard ~ 1501/4500 = 0.334; rho/k has binomial spread
    assert(math.abs(get("est_jaccard_ppm") - get("exact_jaccard_ppm")) < 150000)
  }
}
