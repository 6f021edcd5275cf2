package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KnScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("knBigramScores: hand-counted statistics, micro-unit terms, probabilities sum to 1") {
    // bigrams: (a,b)×2, (a,c)×1 → c(a)=3, N1+(a,·)=2, N1+(·,b)=N1+(·,c)=1,
    // N1+(··)=2
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val d = 0.75
    // the exact double tree the op builds: (c−D)/cv + D·n1v/cv·(n1w/n1all)
    def p(c: Long, cv: Long, n1v: Long, n1w: Long, n1all: Long): Double =
      (c.toDouble - d) / cv.toDouble +
        d * n1v.toDouble / cv.toDouble * (n1w.toDouble / n1all.toDouble)
    val pB = p(2, 3, 2, 1, 2) // P(b|a)
    val pC = p(1, 3, 2, 1, 2) // P(c|a)
    // KN's mass-conservation property on a single-context corpus
    assert(math.abs(pB + pC - 1.0) < 1e-12)
    val out = TextOps.knBigramScores(docs, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((1L, math.round(math.log(pB) * 1e6))))
    assert(out(1L) == out(0L)) // identical docs score identically
    assert(out(2L) == ((1L, math.round(math.log(pC) * 1e6))))
    // the common transition outranks the rare one on the mean-log surface
    assert(out(0L)._2 > out(2L)._2)
  }

  test("knBigramScores: single-token docs drop; discount domain enforced") {
    val docs = Seq((0L, "a b"), (1L, "x")).toDF("doc_id", "text")
    val out = TextOps.knBigramScores(docs, 0.75).collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L))
    assertThrows[IllegalArgumentException] {
      TextOps.knBigramScores(docs, 1.5)
    }
  }
}
