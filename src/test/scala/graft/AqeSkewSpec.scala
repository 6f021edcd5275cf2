package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: PLANS.md leans on runtime skew-join splitting as
  * the backstop for skew the static plan can't see (SkewOps salting is
  * the explicit fallback when thresholds DON'T trigger). This spec
  * proves the engine's config actually trips that machinery: a join with
  * one hot key re-plans at runtime with the skewed partition split.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // tiny thresholds so test-sized data counts as "skewed"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      // one hot key (0) carrying ~100× the median partition's bytes; the
      // payload is id-derived (not a foldable literal — the optimizer
      // would prune a constant) and high-entropy (skew detection sees
      // COMPRESSED shuffle sizes; repeated literals compress to nothing)
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 500 + 1).as("k"),
          concat_ws("", (1 to 4).map(i =>
            md5(concat(lit(i.toString), col("id").cast("string")))): _*).as("pay"))
      val dim = spark.range(0, 501).select(col("id").as("k"), lit(1L).as("v"))
      // NOTE: a same-key aggregate directly over the join would FORBID the
      // split (AQE won't break a partitioning a downstream stage reuses);
      // the global count has no distribution requirement
      // sum(length(pay)) keeps the payload column alive through the join
      // (column pruning would otherwise shrink partitions below any
      // skew threshold)
      val joined = fact.join(dim, Seq("k")).groupBy()
        .agg(sum(length(col("pay"))).as("paylen"),
          sum(when(col("k") === 0L, 1L).otherwise(0L)).as("hot"))
      val row = joined.collect()(0)
      // correctness through the split: every fact row exactly once
      // (4 concatenated md5 hex digests = 128 chars per row)
      assert(row.getLong(0) == 60000L * 128 && row.getLong(1) == 50000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(2000))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
