package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class WeakLabelOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("majority label model: abstentions excluded, ties surfaced as -1") {
    // drive the model with per-row literal votes via CASE on doc_id
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    def v(m: Map[Long, Long]) =
      m.foldLeft(lit(-1L)) { case (acc, (id, vote)) =>
        when(col("doc_id") === id, lit(vote)).otherwise(acc)
      }
    val lfs = Seq(
      v(Map(1L -> 1L, 2L -> 1L, 3L -> -1L, 4L -> 0L)),
      v(Map(1L -> 1L, 2L -> 0L, 3L -> -1L, 4L -> 0L)),
      v(Map(1L -> -1L, 2L -> -1L, 3L -> -1L, 4L -> 1L)))
    val out = WeakLabelOps.majorityLabel(docs, lfs, Seq(col("doc_id")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_votes"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("majority")))).toMap
    assert(out(1L) == ((2L, 2L, 1L)))  // two positives, one abstain
    assert(out(2L) == ((2L, 1L, -1L))) // 1-1 tie → surfaced, not coerced
    assert(out(3L) == ((0L, 0L, -1L))) // all abstain
    assert(out(4L) == ((3L, 1L, 0L)))  // 2-1 negative majority
  }

  test("English LFs produce only {-1,0,1} and never null") {
    val docs = Seq((0L, "the of and the"), (1L, "zzz qqq"), (2L, "x"))
      .toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(col("text")))
    val out = WeakLabelOps.majorityLabel(
      docs, WeakLabelOps.englishLfs(col("toks")), Seq(col("doc_id")))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      (0 to 2).foreach { i =>
        val v = r.getAs[Long](s"v$i")
        assert(v == -1L || v == 0L || v == 1L, s"v$i=$v")
      }
    }
  }

  private def kappa(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val out = WeakLabelOps.pairKappa(
      rows.toDF("a", "b"), Seq(col("a"), col("b")))
      .collect().head
    (out.getLong(2), out.getLong(3), out.getLong(4))
  }

  test("pairKappa: perfect, chance, and anti-agreement land at 1e6 / 0 / -1e6") {
    // perfect agreement with a mixed distribution: po=1, pe=0.5 → κ=1e6
    assert(kappa(Seq((1L, 1L), (0L, 0L))) == ((2L, 2L, 1000000L)))
    // exact chance level: po=0.5, pe=0.5 → κ=0
    assert(kappa(Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L))) ==
      ((4L, 2L, 0L)))
    // systematic disagreement: po=0, pe=0.5 → κ=-1e6
    assert(kappa(Seq((1L, 0L), (0L, 1L))) == ((2L, 0L, -1000000L)))
  }

  test("pairKappa: abstentions excluded; degenerate pairs guarded") {
    // the two abstaining rows must not move the statistics
    assert(kappa(Seq((1L, 1L), (0L, 0L), (-1L, 1L), (1L, -1L))) ==
      ((2L, 2L, 1000000L)))
    // both LFs constant and equal: pe=1 → κ=1e6 by convention
    assert(kappa(Seq((1L, 1L), (1L, 1L))) == ((2L, 2L, 1000000L)))
    // no co-voting rows at all: κ=0
    assert(kappa(Seq((-1L, 1L), (1L, -1L))) == ((0L, 0L, 0L)))
    // three LFs → three pair rows, ids ordered
    import org.apache.spark.sql.functions.col
    val three = WeakLabelOps.pairKappa(
      Seq((1L, 1L, 0L)).toDF("a", "b", "c"),
      Seq(col("a"), col("b"), col("c")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(three == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }
}
