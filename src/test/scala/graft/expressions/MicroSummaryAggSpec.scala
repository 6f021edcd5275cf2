package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MicroSummaryAggSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val facts = Seq(
    (1L, 1.5), (1L, 2.25), (1L, -0.5), (1L, 4.0),
    (2L, 10.0), (2L, 10.0), (3L, 0.3333333))

  test("the typed Aggregator equals the ChangeOps merge path exactly") {
    val summ = udaf(MicroSummaryAgg)
    val viaAgg = facts.toDF("k", "v")
      .groupBy("k").agg(summ(col("v")).as("s"))
      .select(col("k"), col("s.n"), col("s.sum_micro"), col("s.min_micro"),
        col("s.max_micro"), col("s.avg_micro"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val viaOps = graft.ops.ChangeOps.mergeSummaries(
      Seq(graft.ops.ChangeOps.microSummary(
        facts.toDF("k", "v"), Seq("k"), "v")), Seq("k"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(viaAgg == viaOps)
    assert(viaAgg(1L) == ((4L, 7250000L, -500000L, 4000000L, 1812500L)))
  }

  test("merge is associative over arbitrary splits (the partial-combine contract)") {
    val bufs = facts.map { case (_, v) => MicroSummaryAgg.reduce(
      MicroSummaryAgg.zero, v) }
    val left = bufs.reduceLeft(MicroSummaryAgg.merge)
    val right = bufs.reduceRight(MicroSummaryAgg.merge)
    assert(left == right)
    assert(MicroSummaryAgg.merge(left, MicroSummaryAgg.zero) == left)
  }

  test("SQL registration: the udaf resolves by name") {
    spark.udf.register("micro_summary", udaf(MicroSummaryAgg))
    val r = spark.sql(
      "SELECT micro_summary(v).sum_micro AS s FROM VALUES (1.5), (2.5) t(v)")
      .head.getLong(0)
    assert(r == 4000000L)
  }
}
