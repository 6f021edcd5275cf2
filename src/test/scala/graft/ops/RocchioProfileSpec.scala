package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class RocchioProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("labelPrototypes: exact per-label means; nearest-prototype confusion matrix") {
    val emb = Seq(
      (0L, Array(1.0, 0.0), 0),
      (1L, Array(3.0, 0.0), 0),
      (2L, Array(0.0, 2.0), 1),
      (3L, Array(0.0, 4.0), 1),
      (4L, Array(2.0, 0.0), 1) // label-1 outlier sitting on label 0's axis
    ).toDF("vec_id", "embedding", "label")
    val protos = SimilarityOps.labelPrototypes(emb)
    assert(protos.map(_._1) == Seq(0L, 1L))
    assert(protos(0)._2.toSeq == Seq(2.0, 0.0))
    // (0+0+2)/3 rounds to 0.666667 under the 6dp decimal-mean contract
    assert(protos(1)._2.toSeq == Seq(0.666667, 2.0))
    val conf = emb
      .select(col("label").cast("long").as("label"),
        SimilarityOps.assignCell(protos, 6).as("predicted"))
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the outlier is claimed by label 0's prototype; everything else holds
    assert(conf == Map((0L, 0L) -> 2L, (1L, 1L) -> 2L, (1L, 0L) -> 1L))
  }

  test("source entropy profile: uniform source has zero c·ln c mass; repeated source does not") {
    val docs = Seq(
      (0L, "a a a", "A"),
      (1L, "x y z", "B")
    ).toDF("doc_id", "text", "source")
    val c = docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val out = c.groupBy("source").agg(
      count(lit(1)).as("vocab_size"),
      sum("c").as("n_tokens"),
      sum(round(col("c") * log(col("c").cast("double")) * lit(1000000.0))
        .cast("long")).as("clogc_sum_micro"),
      floor(count(lit(1)).cast("double") * lit(1000000.0) / sum("c"))
        .cast("long").as("ttr_micro"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") ==
      ((1L, 3L, math.round(3.0 * math.log(3.0) * 1e6), 333333L)))
    assert(out("B") == ((3L, 3L, 0L, 1000000L)))
  }
}
