package graft.ops

import org.apache.spark.sql.Column
import org.scalatest.funsuite.AnyFunSuite

class LinkageWeightsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val fields = Seq[(String, (Column, Column) => Column)](
    "lang" -> ((a, b) => a.getField("lang") === b.getField("lang")),
    "source" -> ((a, b) => a.getField("source") === b.getField("source")),
    "len_bucket" -> ((a, b) =>
      org.apache.spark.sql.functions.floor(
        a.getField("n_chars").cast("double") /
          org.apache.spark.sql.functions.lit(100.0)) ===
        org.apache.spark.sql.functions.floor(
          b.getField("n_chars").cast("double") /
            org.apache.spark.sql.functions.lit(100.0))))

  test("linkageWeights: hand-labeled m/u rates and ln(m/u) weights") {
    // matched pair (2→1): lang agrees, source disagrees, length agrees.
    // unmatched (offset 2): (1,3) lang✗ src✓ len✗; (2,4) lang✓ src✗ len✓
    val docs = Seq(
      (1L, "a", "en", "x", 5L),
      (2L, "a", "en", "y", 5L),
      (3L, "b", "de", "x", 205L),
      (4L, "c", "en", "x", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.linkageWeights(docs, fields, offset = 2L)
      .collect().map(r => r.getAs[String]("field") ->
        (r.getAs[Long]("n_matched"), r.getAs[Long]("n_unmatched"),
          r.getAs[Long]("m_micro"), r.getAs[Long]("u_micro"),
          r.getAs[Long]("weight_milli"))).toMap
    // Laplace: m_lang = (1+1)/(1+2), u_lang = (1+1)/(2+2)
    assert(out("lang") == (1L, 2L, 666667L, 500000L, 288L), s"$out")
    // source: m = 1/3, u = 1/2 → negative evidence
    assert(out("source") == (1L, 2L, 333333L, 500000L, -405L))
    assert(out("len_bucket") == (1L, 2L, 666667L, 500000L, 288L))
  }

  test("linkageWeights: a corpus with no exact duplicates yields null m rates") {
    val docs = Seq(
      (1L, "a", "en", "x", 5L), (2L, "b", "en", "x", 6L),
      (3L, "c", "en", "x", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.linkageWeights(docs, fields, offset = 1L).collect()
    assert(out.length == 3)
    // zero matched pairs: n_matched 0, agreement sums null → null m/w
    assert(out.forall(r => r.getAs[Long]("n_matched") == 0L && r.isNullAt(3)))
  }
}
