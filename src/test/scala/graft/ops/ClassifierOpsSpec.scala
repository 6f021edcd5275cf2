package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class ClassifierOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // stopword-dense docs labeled 1, stopword-free docs labeled 0: the
  // stopword-ratio feature alone separates the classes
  private def docs = Seq(
    (0L, "the of and the of", 1),
    (1L, "the and a of the", 1),
    (2L, "quasar manifold tensor", 0),
    (3L, "galaxy spectrum flux", 0)
  ).toDF("doc_id", "text", "y")
    .withColumn("toks", TextOps.tokens(col("text")))

  test("GD moves the separating feature's weight the right way, deterministically") {
    val xs = ClassifierOps.features(col("toks"))
    val w1 = ClassifierOps.trainLogistic(docs, xs, col("y") === 1)
    val w2 = ClassifierOps.trainLogistic(docs, xs, col("y") === 1)
    assert(w1 == w2, "training must be bit-deterministic")
    assert(w1.forall(_.isFinite))
    // stopword ratio is 1.0 for the positive class, 0.0 for the negative:
    // its weight must come out positive
    assert(w1(1) > 0, s"stopword-ratio weight should be positive, got $w1")
    // and the induced scores must order the classes correctly
    val scores = docs
      .select(col("doc_id"), ClassifierOps.score(w1, xs).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(0L) > scores(2L) && scores(1L) > scores(3L), scores.toString)
  }

  test("rows with null features are excluded from training, not poisoning sums") {
    val withEmpty = docs.unionByName(
      Seq((9L, "", 1)).toDF("doc_id", "text", "y")
        .withColumn("toks", array().cast("array<string>")))
    val xs = ClassifierOps.features(col("toks"))
    // empty token array → null ratio features; training must still converge
    val w = ClassifierOps.trainLogistic(withEmpty, xs, col("y") === 1)
    assert(w.forall(_.isFinite))
    assert(w == ClassifierOps.trainLogistic(docs, xs, col("y") === 1),
      "the null-feature row must not change the gradient")
  }
}
