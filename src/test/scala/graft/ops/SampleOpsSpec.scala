package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SampleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val rows = Seq.tabulate(2000)(i =>
    (i.toLong, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")

  test("hashSample is deterministic and partitioning-independent") {
    val a = SampleOps.hashSample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = SampleOps.hashSample(rows.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b)                       // same rows regardless of layout
    assert(a.size > 300 && a.size < 500) // ~400 of 2000 at 20%
  }

  test("a smaller fraction's sample nests inside a larger one") {
    val small = SampleOps.hashSample(rows, "id", 0.05)
      .select("id").as[Long].collect().toSet
    val large = SampleOps.hashSample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(large)) // incremental-reprocessing stability
  }

  test("stratified fractions apply per stratum; unlisted strata drop") {
    val out = SampleOps.stratifiedHashSample(
      rows, "id", "lang", Map("en" -> 1.0)).select("lang").as[String].collect()
    assert(out.nonEmpty && out.forall(_ == "en")) // de unlisted → dropped
    val mixed = SampleOps.stratifiedHashSample(
      rows, "id", "lang", Map("en" -> 1.0, "de" -> 0.1))
    val byLang = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == 500L)                  // fraction 1.0 keeps all
    assert(byLang("de") > 75L && byLang("de") < 225L) // ~150 of 1500
  }
}
