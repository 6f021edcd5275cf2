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

  private def confusion(rows: Seq[(Long, String, String)]): Map[(String, String), Long] =
    ClassifierOps.naiveBayesConfusion(
      rows.toDF("doc_id", "lang", "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("naive bayes: separable vocabularies classify perfectly") {
    val rows = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the dog sat"),
      (2L, "de", "der hund schlief"),
      (3L, "de", "die katze und der hund"))
    assert(confusion(rows) == Map(("en", "en") -> 2L, ("de", "de") -> 2L))
  }

  test("naive bayes: a doc wearing the other class's vocabulary crosses over") {
    val rows = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the dog sat on the mat"),
      (2L, "en", "der hund schlief tief"), // mislabeled: pure-de tokens
      (3L, "de", "der hund schlief"),
      (4L, "de", "die katze und der hund"))
    val c = confusion(rows)
    assert(c(("en", "de")) == 1L, s"the de-vocab doc must predict de: $c")
    assert(c(("en", "en")) == 2L && c(("de", "de")) == 2L, c.toString)
  }

  test("naive bayes: exact class symmetry breaks the tie to the smaller class name") {
    // two classes with IDENTICAL statistics over disjoint docs: every
    // doc scores the same under both, so all predictions land on "aa"
    val rows = Seq((0L, "aa", "x y"), (1L, "bb", "x y"))
    assert(confusion(rows) ==
      Map(("aa", "aa") -> 1L, ("bb", "aa") -> 1L))
  }

  test("naive bayes: engine matches a plain-Scala replay of the micro contract") {
    val rows = Seq(
      (0L, "en", "the cat sat"),
      (1L, "en", "the dog"),
      (2L, "de", "der hund"),
      (3L, "de", "der der hund katze"))
    def micro(x: Double) =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val tf = rows.flatMap { case (id, l, t) =>
      t.split(" ", -1).toSeq.map(tok => (id, l, tok))
    }.groupMapReduce(identity)(_ => 1L)(_ + _)
    val c = tf.toSeq.groupMapReduce { case ((_, l, tok), _) => (l, tok) }(_._2)(_ + _)
    val nl = c.toSeq.groupMapReduce(_._1._1)(_._2)(_ + _)
    val vocab = c.keys.map(_._2).toSet.size
    val dl = rows.groupMapReduce(_._2)(_ => 1L)(_ + _)
    val classes = dl.keys.toSeq.sorted
    val ref = rows.map { case (id, l, _) =>
      val docTf = tf.collect { case ((i, _, tok), n) if i == id => tok -> n }
      val nD = docTf.values.sum
      val pred = classes.map { cl =>
        val tsum = docTf.collect {
          case (tok, n) if c.contains((cl, tok)) =>
            micro(n.toDouble * math.log(c((cl, tok)).toDouble + 1.0) * 1e6)
        }.sum
        val s = tsum - micro(nD.toDouble * math.log((nl(cl) + vocab).toDouble) * 1e6) +
          micro(math.log(dl(cl).toDouble / rows.size) * 1e6)
        (cl, s)
      }.sortBy { case (cl, s) => (-s, cl) }.head._1
      (l, pred)
    }.groupMapReduce(identity)(_ => 1L)(_ + _)
    assert(confusion(rows) == ref)
  }

  test("conformalEval: well-separated classes give >=1-alpha coverage and tight sets") {
    // two tight clusters far apart in 2D: scores to the true prototype
    // are tiny, to the other huge -> sets should be ~singletons
    val pts = (0L until 400L).map { i =>
      val label = (i % 2).toInt
      val base = if (label == 0) 0.0 else 10.0
      val jx = (i % 7).toDouble / 100.0
      val jy = (i % 5).toDouble / 100.0
      (i, Array((base + jx).toFloat, (base + jy).toFloat), label)
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val protos = SimilarityOps.labelPrototypes(emb)
    val r = ClassifierOps.conformalEval(emb, protos).collect().head
    val get = (n: String) => r.getLong(r.fieldIndex(n))
    assert(get("n_cal") + get("n_test") == 400L)
    assert(get("coverage_ppm") >= 900000L,
      s"coverage ${get("coverage_ppm")} below the 90% guarantee")
    // far-apart clusters: the other label's score never clears qhat
    assert(get("avg_set_micro") <= 1100000L,
      s"avg set ${get("avg_set_micro")} not tight on separable data")
  }

  test("conformalEval: the quantile clamps to n_cal when ceil((n+1)*0.9) > n") {
    // ids chosen so the md5 split puts EXACTLY three on the calibration
    // side (6, 9, 11) -> ceil((3+1)*0.9) = 4 > 3 -> qhat clamps to the
    // max calibration score instead of selecting a missing rank
    val ids = Seq(6L, 9L, 11L, 0L, 1L, 2L)
    val pts = ids.map(i => (i, Array(i.toFloat, 0.0f), (i % 2).toInt))
    val emb = pts.toDF("vec_id", "embedding", "label")
    val protos = SimilarityOps.labelPrototypes(emb)
    val out = ClassifierOps.conformalEval(emb, protos).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("n_cal")) == 3L)
    assert(r.getLong(r.fieldIndex("n_test")) == 3L)
  }
}
