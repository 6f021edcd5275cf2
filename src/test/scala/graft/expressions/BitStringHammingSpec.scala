package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.ops.DedupOps

class BitStringHammingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bit_hamming: SQL registration, codegen evaluation, edge cases") {
    GraftExtensions.register(spark)
    val df = Seq(
      ("0000", "0000", 0),
      ("0101", "0000", 2),
      ("1111", "0000", 4),
      ("111", "0000", -1) // length mismatch sentinel
    ).toDF("a", "b", "expected")
    val bad = df.withColumn("got", expr("bit_hamming(a, b)"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)

    // null propagation (BinaryExpression null-safety)
    val n = Seq((Option.empty[String], Option("0"))).toDF("a", "b")
      .selectExpr("bit_hamming(a, b)").head()
    assert(n.isNullAt(0))

    // SQL path after registration
    assert(spark.sql("SELECT bit_hamming('10', '01')").head().getInt(0) == 2)
  }

  test("bit_hamming agrees with a reference implementation on random strings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(64)(rnd.nextInt(2)).mkString
      val b = Seq.fill(64)(rnd.nextInt(2)).mkString
      (a, b, a.zip(b).count { case (x, y) => x != y })
    }
    GraftExtensions.register(spark)
    val bad = rows.toDF("a", "b", "expected")
      .withColumn("got", expr("bit_hamming(a, b)"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("simhashPairs finds exact dups at hamming 0 via block buckets") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated content words appear here instead now")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(DedupOps.simhash(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 0)))
  }
}
