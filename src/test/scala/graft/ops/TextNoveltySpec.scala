package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TextNoveltySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("noveltyScores: distinct-per-doc grams, df across docs, short docs drop") {
    val docs = Seq(
      (0L, "a b c"),     // grams {a b, b c}
      (1L, "a b c x"),   // grams {a b, b c, c x}
      (3L, "a b a b"),   // grams {a b, b a} — in-row duplicate counted once
      (2L, "z")          // no bigrams: absent from output
    ).toDF("doc_id", "text")
    val out = TextOps.noveltyScores(docs, 2)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // df: "a b"=3, "b c"=2, "c x"=1, "b a"=1
    assert(out(0L) == ((2L, 0L, 0.0)))
    assert(out(1L) == ((3L, 1L, 0.333333)))
    assert(out(3L) == ((2L, 1L, 0.5)))
    assert(!out.contains(2L))
  }
}
