package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixOpsSpec extends AnyFunSuite {

  test("packEfficiency: hand-traced greedy no-split pack with overflow docs") {
    val spark2 = graft.SparkTestSession.spark
    import spark2.implicits._
    // sizes in id order: 10, 50, 10, 70 at L=64:
    //  10 -> fill 10; 50 -> fill 60; 10 overflows -> seq closed (pad 4),
    //  fill 10; 70 > 64 -> flush (pad 54), one full chunk + rem 6
    //  (pad 58) -> 4 sequences, pad 116, total 140
    val docs = Seq(("g", 1L, 10L), ("g", 2L, 50L), ("g", 3L, 10L),
      ("g", 4L, 70L)).toDF("src", "id", "tok")
    val r = MixOps.packEfficiency(docs, "src", "id", "tok", Seq(64))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((64L, 4L, 140L, 4L, 116L, 546875L)))
    // at L = 140 everything packs into one full sequence: fill 1e6
    val exact = MixOps.packEfficiency(docs, "src", "id", "tok", Seq(140))
      .collect().head
    assert(exact.getLong(4) == 1L && exact.getLong(5) == 0L &&
      exact.getLong(6) == 1000000L)
  }
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("equalTokenDownsample keeps rare strata whole and thins dominant ones to budget") {
    // en: 900 tokens across 90 docs; fr: 100 tokens across 10 docs.
    // total=1000, n=2 → budget 500/stratum → f(en)=500/900, f(fr)=1 (capped)
    val docs = ((1 to 90).map(i => (i.toLong, "en", 10L)) ++
      (91 to 100).map(i => (i.toLong, "fr", 10L)))
      .toDF("doc_id", "lang", "tok")
    val out = MixOps.equalTokenDownsample(docs, "doc_id", "lang", "tok")
      .select("doc_id", "lang").as[(Long, String)].collect().toSet

    // fr passes entirely (fraction capped at 1)
    assert((91 to 100).forall(i => out.contains((i.toLong, "fr"))))
    // en membership matches the explicit hash-threshold draw
    val thr = math.floor((500.0 / 900.0) * SampleOps.HashSpace).toLong
    val expectEn = (1 to 90).filter { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).take(2)
      val draw = ((h(0) & 0xffL) << 8) | (h(1) & 0xffL)
      draw < thr
    }.map(i => (i.toLong, "en")).toSet
    assert(out.filter(_._2 == "en") == expectEn)
    // and it actually thinned (the binomial draw straying to 0 or 90
    // would make the assertion above vacuous)
    assert(expectEn.nonEmpty && expectEn.size < 90)
  }

  test("temperature endpoints: alpha=1 keeps everything, alpha=0 = equal-token") {
    val docs = (1 to 200).map(i =>
      (i.toLong, if (i % 4 == 0) "a" else "b", (i % 7 + 1).toLong))
      .toDF("doc_id", "lang", "tok")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    // alpha=1: every stratum's target share IS its natural share → all kept
    assert(ids(MixOps.temperatureDownsample(docs, "doc_id", "lang", "tok", 1.0))
      == (1L to 200L))
    // alpha=0: pw=1 for every stratum, z=n → identical to the equal-token rule
    assert(ids(MixOps.temperatureDownsample(docs, "doc_id", "lang", "tok", 0.0))
      == ids(MixOps.equalTokenDownsample(docs, "doc_id", "lang", "tok")))
    // and an interior alpha keeps at least as much of the dominant
    // stratum as alpha=0 (monotone in alpha)
    val n0 = ids(MixOps.temperatureDownsample(docs, "doc_id", "lang", "tok", 0.0)).size
    val nHalf = ids(MixOps.temperatureDownsample(docs, "doc_id", "lang", "tok", 0.5)).size
    assert(nHalf >= n0)
  }

  test("budgetPrefix keeps the best-first prefix, including the budget-crossing row") {
    import spark.implicits._
    val docs = Seq(
      // (doc_id, lang, tok): en sorted by tok desc → 50, 40, 30, 20
      (1L, "en", 40L), (2L, "en", 50L), (3L, "en", 30L), (4L, "en", 20L),
      // de: a single doc bigger than the budget is still kept (crossing row)
      (5L, "de", 500L),
      // fr: total below budget → everything kept
      (6L, "fr", 10L), (7L, "fr", 15L)
    ).toDF("doc_id", "lang", "tok")
    val kept = MixOps.budgetPrefix(docs, "doc_id", "lang", "tok", "tok", 100L)
      .select("doc_id").as[Long].collect().toSet
    // en prefix: 50 (cum-before 0) + 40 (50) + 30 (90) kept, 20 (120) dropped
    assert(kept == Set(2L, 1L, 3L, 5L, 6L, 7L))
    // equal scores tiebreak by doc_id: deterministic on any partitioning
    val ties = Seq((1L, "x", 60L), (2L, "x", 60L), (3L, "x", 60L))
      .toDF("doc_id", "lang", "tok")
    val k2 = MixOps.budgetPrefix(ties.repartition(7), "doc_id", "lang", "tok", "tok", 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(k2 == Set(1L, 2L)) // 60 (0) + 60 (60) kept, third (120) dropped
  }

  test("equalTokenDownsample is partitioning-independent") {
    val docs = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", (i % 7 + 1).toLong))
      .toDF("doc_id", "lang", "tok")
    def ids(df: org.apache.spark.sql.DataFrame) =
      MixOps.equalTokenDownsample(df, "doc_id", "lang", "tok")
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids(docs) == ids(docs.repartition(13, col("doc_id"))))
  }
}
