package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The runtime-filter pair surfaced by GraftExtensions: bloom_filter_agg
  * and might_contain must resolve from SQL text, and the probe must never
  * reject a true member (blooms have false positives, never negatives).
  */
class BloomRegistrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bloom_filter_agg + might_contain resolve in SQL and admit every member") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (1L to 1000L).toDF("k").createOrReplaceTempView("bloom_members")
    (1L to 2000L).toDF("k").createOrReplaceTempView("bloom_probes")
    val admitted = spark.sql(
      """SELECT k FROM bloom_probes
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(k), 10000L) FROM bloom_members),
        |  xxhash64(k))""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    // no false negatives: every member admitted
    assert((1L to 1000L).forall(admitted.contains))
    // and the filter actually filters: the non-member half is mostly gone
    // (false-positive rate at 10k capacity for 1k items is ~0)
    assert(admitted.count(_ > 1000L) < 100)
  }
}
