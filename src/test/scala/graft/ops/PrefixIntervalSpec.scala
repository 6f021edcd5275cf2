package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class PrefixIntervalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // -- PrefixOps ----------------------------------------------------------

  test("globalCumsum equals the single-partition window formulation") {
    val df = Seq.tabulate(997)(i => ((i * 37 % 997).toLong, (i % 13 + 1).toLong))
      .toDF("k", "v")
    val expected = df
      .withColumn("cum",
        sum("v").over(Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val got = PrefixOps.globalCumsum(df, "k", Seq.empty, "v", "cum", nBins = 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("globalCumsum is partitioning-independent and never single-bins real data") {
    val df = Seq.tabulate(500)(i => (i.toLong, 1L)).toDF("k", "v")
    val a = PrefixOps.globalCumsum(df, "k", Seq.empty, "v", "cum", nBins = 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val b = PrefixOps.globalCumsum(df.repartition(17), "k", Seq.empty, "v", "cum", nBins = 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(499L) == 500L) // total lands in the last row
  }

  test("globalRowNumber ranks ties by the tie column") {
    val df = Seq((5L, "b"), (5L, "a"), (1L, "z")).toDF("k", "id")
    val got = PrefixOps.globalRowNumber(df, "k", Seq("id"), "pos", nBins = 4)
      .select("id", "pos").as[(String, Long)].collect().toMap
    assert(got == Map("z" -> 1L, "a" -> 2L, "b" -> 3L))
  }

  test("globalCumsum survives a constant bin column (all quantiles equal)") {
    val df = Seq.tabulate(10)(i => (7L, i.toLong, 1L)).toDF("k", "id", "v")
    val got = PrefixOps.globalCumsum(df, "k", Seq("id"), "v", "cum", nBins = 4)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == Seq.tabulate(10)(i => i.toLong -> (i + 1L)).toMap)
  }

  // -- IntervalOps ---------------------------------------------------------

  test("mergeIntervals merges overlap, containment, and adjacency correctly") {
    // k=a: [0,10) contains [2,3), overlaps [9,15) -> one island [0,15) of 3
    //      [20,25) disjoint -> its own island
    // k=b: touching intervals [0,5),[5,8) merge (start == prior end is NOT >)
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 2L, 3L, 2L), ("a", 9L, 15L, 3L), ("a", 20L, 25L, 4L),
      ("b", 0L, 5L, 5L), ("b", 5L, 8L, 6L))
      .toDF("k", "s", "e", "id")
    val got = IntervalOps.mergeIntervals(df, "k", "s", "e", "id")
      .select("k", "island_start", "island_end", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 15L, 3L), ("a", 20L, 25L, 1L), ("b", 0L, 8L, 2L)))
  }

  test("mergeIntervals honors a long container over later short ends") {
    // [0,100) then [10,20): running-max end keeps the island open at 100
    // even though the most recent interval ended at 20 — then [50,60)
    // still belongs to the island (a lag-based merge would split here).
    val df = Seq(("k", 0L, 100L, 1L), ("k", 10L, 20L, 2L), ("k", 50L, 60L, 3L))
      .toDF("k", "s", "e", "id")
    val got = IntervalOps.mergeIntervals(df, "k", "s", "e", "id")
      .select("island_start", "island_end", "n_merged")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 100L, 3L)))
  }

  private def kth(vals: Seq[Double], nBins: Int = 4,
      k: Long => Long = n => (n - 1) / 2): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    PrefixOps.exactKth(vals.toDF("value"), "value", k, nBins)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("exactKth: lower median across bins, ties, duplicates") {
    assert(kth(Seq(5, 1, 9, 3, 7)) == Seq((5L, 2L, 5.0)))
    // even count → lower median
    assert(kth(Seq(4, 1, 3, 2)) == Seq((4L, 1L, 2.0)))
    // duplicates spanning the rank
    assert(kth(Seq(2, 2, 2, 1, 3)) == Seq((5L, 2L, 2.0)))
    // matches a plain sort at every rank, with coarse bins forcing the
    // offset path
    val vs = Seq(0.3, -2.0, 5.5, 5.5, 1.0, 9.9, -2.0, 4.1)
    val sorted = vs.sorted
    for (r <- sorted.indices)
      assert(kth(vs, nBins = 2, k = _ => r.toLong) ==
        Seq((vs.length.toLong, r.toLong, sorted(r))), s"rank $r")
  }

  test("exactKth: degenerate inputs (all-equal, empty, nulls)") {
    import spark.implicits._
    assert(kth(Seq(7, 7, 7)) == Seq((3L, 1L, 7.0)))
    assert(PrefixOps.exactKth(
      Seq.empty[Double].toDF("value"), "value").collect().isEmpty)
    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(3.0), None)
      .toDF("value")
    assert(PrefixOps.exactKth(withNulls, "value")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((2L, 1.0)))
  }
}
