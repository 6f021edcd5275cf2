package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  val keys: Seq[String] =
    Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")

  test("count-min never undercounts and is exact without collisions") {
    val df = keys.toDF("k")
    val cms = SketchOps.cmsTable(df, "k")
    val est = SketchOps.cmsEstimate(
      df.distinct(), cms, "k")
      .as[(String, Long)].collect().toMap
    // 3 distinct keys in a 4×1024 sketch: no collisions, estimates exact
    assert(est == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("sketches merge cell-wise: cms(a ++ b) == cms(a) + cms(b)") {
    val (a, b) = (keys.take(4), keys.drop(4))
    val whole = SketchOps.cmsTable(keys.toDF("k"), "k")
    val merged = SketchOps.cmsTable(a.toDF("k"), "k")
      .unionByName(SketchOps.cmsTable(b.toDF("k"), "k"))
      .groupBy("r", "b").agg(sum("c").as("c"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("heavy hitters equal the naive GROUP BY + HAVING, even under forced collisions") {
    // skewed keys: two heavies, a mid, and a tail of singletons
    val data = Seq.fill(40)("hot-1") ++ Seq.fill(25)("hot-2") ++
      Seq.fill(10)("warm") ++ (1 to 30).map(i => s"cold-$i")
    val df = data.toDF("k")
    def naive(t: Long) = df.groupBy("k").agg(count(lit(1)).as("true_count"))
      .filter(col("true_count") >= t)
      .as[(String, Long)].collect().toMap
    // comfortable width: no collisions
    assert(SketchOps.cmsHeavyHitters(df, "k", 20)
      .as[(String, Long)].collect().toMap == naive(20))
    // width 2: heavy collisions inflate estimates (false positives), but
    // the exact re-count drops them and no true heavy is ever missed
    assert(SketchOps.cmsHeavyHitters(df, "k", 20, width = 2)
      .as[(String, Long)].collect().toMap == naive(20))
    // empty input degrades to an empty result
    assert(SketchOps.cmsHeavyHitters(
      Seq.empty[String].toDF("k"), "k", 5).count() == 0)
  }

  test("heavy hitters retain a NULL-key group exactly like the naive form") {
    // NULL never hashes (its estimate is null), so without the explicit
    // null-retention branch the candidate filter silently drops it while
    // the naive GROUP BY keeps it as a real group
    val data = Seq.fill(30)(Some("hot")) ++ Seq.fill(25)(None) ++
      Seq.fill(5)(Some("cold"))
    val df = data.toDF("k")
    val naive = df.groupBy("k").agg(count(lit(1)).as("true_count"))
      .filter(col("true_count") >= 20)
      .as[(Option[String], Long)].collect().toMap
    assert(naive.contains(None)) // the oracle side genuinely has the group
    assert(SketchOps.cmsHeavyHitters(df, "k", 20)
      .as[(Option[String], Long)].collect().toMap == naive)
  }

  test("estimates for never-sketched keys are 0, not missing or inflated") {
    val cms = SketchOps.cmsTable(keys.toDF("k"), "k")
    val est = SketchOps.cmsEstimate(
      Seq("alpha", "never-seen-1", "never-seen-2").toDF("k"), cms, "k")
      .as[(String, Long)].collect().toMap
    // unpopulated cells are counters of 0: a probed key missing from the
    // sketch must come back with estimate 0 (left join + coalesce), not
    // vanish (inner join) or overestimate off only its populated cells
    assert(est == Map("alpha" -> 5L, "never-seen-1" -> 0L, "never-seen-2" -> 0L))
  }

  test("collisions overestimate, never undercount: one-sided at tiny width") {
    // width 2 forces heavy collisions; the min-over-rows estimate must
    // still be >= the true count for every key
    val df = (1 to 50).map(i => s"key-${i % 7}").toDF("k")
    val cms = SketchOps.cmsTable(df, "k", width = 2)
    val truth = df.groupBy("k").agg(count(lit(1)).as("t"))
    val est = SketchOps.cmsEstimate(truth.select("k"), cms, "k", width = 2)
    val bad = truth.join(est, Seq("k"))
      .filter(col("cms_estimate") < col("t")).count()
    assert(bad == 0)
  }
}
