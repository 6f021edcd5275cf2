package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The point of bucketing is the ABSENCE of a shuffle: joining two
  * tables bucketed on the join key must plan no Exchange on either side.
  */
class BucketingHelperSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equi-bucketed tables join with zero shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val orders = (1 to 1000).map(i => (i.toLong % 100, i.toLong, i * 1.5))
        .toDF("custkey", "orderkey", "total")
      val customers = (0 until 100).map(i => (i.toLong, s"cust-$i"))
        .toDF("custkey", "name")
      Bucketing.writeBucketed(orders, "orders_b", "custkey", 8)
      Bucketing.writeBucketed(customers, "customers_b", "custkey", 8)

      val joined = Bucketing.coLocatedJoin(
        spark, "orders_b", "customers_b", "custkey", "custkey")
      assert(joined.count() == 1000)

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, but plan had an Exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      // contrast: the same join over unbucketed data DOES shuffle
      val unbucketed = orders.join(customers, "custkey")
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customers_b")
    }
  }
}
