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

  test("perplexity buckets: ntile terciles per lang on the floored NLL, short docs drop") {
    import org.apache.spark.sql.functions._
    // en: doc 0 is pure repetition (common transition → low NLL),
    // docs 3/4 are one-off transitions (rare → high NLL); doc 5 has a
    // single token and must not appear in any bucket
    val docs = Seq(
      (0L, "en", "a a a a a a"),
      (1L, "en", "a a b a"),
      (2L, "en", "a b c a"),
      (3L, "en", "c b x q"),
      (4L, "en", "q x p z"),
      (5L, "en", "solo"),
      (6L, "de", "u u u"),
      (7L, "de", "u v w")
    ).toDF("doc_id", "lang", "text")
    val kn = TextOps.knBigramScores(docs, 0.75)
    val scored = kn
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        floor((-col("kn_sum_micro")).cast("double") /
          col("n_bigrams").cast("double")).cast("long").as("nll_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("nll_micro"), col("doc_id"))
    val rows = scored.withColumn("tercile", ntile(3).over(w))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val out = rows.map(r => r._1 -> ((r._2, r._4))).toMap
    assert(!out.contains(5L), "sub-bigram docs carry no LM score")
    // en has 5 scored docs → tercile sizes 2/2/1 (SQL ntile rule)
    val enSizes = out.collect { case (_, ("en", t)) => t }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(enSizes == Map(1 -> 2, 2 -> 2, 3 -> 1), enSizes.toString)
    // the repetition doc (most-probable transitions) sits in the head
    assert(out(0L)._2 == 1, s"repetition doc is head: $out")
    // buckets are monotone in the NLL ranking: sorting by
    // (nll, doc_id) must reproduce the tercile sequence
    for (lang <- Seq("en", "de")) {
      val seq = rows.filter(_._2 == lang).sortBy(r => (r._3, r._1))
        .map(_._4).toSeq
      assert(seq == seq.sorted, s"$lang buckets not monotone: $seq")
    }
    // terciles are computed per lang, not globally
    assert(out(6L)._1 == "de" && out(7L)._1 == "de")
    assert(out.collect { case (_, ("de", t)) => t }.toSet == Set(1, 2))
  }

  test("curriculum order: terciles gate the global order, draw shuffles within") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.PipelineQueries
      .queries("mix_curriculum_order")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // pos is a 1..n permutation
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // every head doc precedes every middle doc precedes every tail doc
    val byPos = rows.sortBy(_._3).map(_._2).toSeq
    assert(byPos == byPos.sorted, "terciles must gate the global order")
    // within a tercile the order is the seeded md5 draw, not doc_id
    def draw(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val head = rows.filter(_._2 == 1L).sortBy(_._3).map(_._1).toSeq
    assert(head == head.sortBy(id => (draw(id), id)),
      "within-tercile order must follow the seeded draw")
    assert(head != head.sorted, "the draw must actually shuffle")
  }
}
