package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("spearman: a perfect monotone (nonlinear) relation scores exactly +1") {
    // y = x³ is monotone but far from linear — Pearson < 1, Spearman = 1
    val df = Seq((1.0, 1.0), (2.0, 8.0), (3.0, 27.0), (4.0, 64.0))
      .toDF("x", "y")
    val r = StatsOps.spearman(df, "x", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 1000000L, s"rho_micro: $r")
  }

  test("spearman: a strict inversion scores exactly −1; ties average ranks") {
    val inv = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0)).toDF("x", "y")
    assert(StatsOps.spearman(inv, "x", "y").collect().head.getLong(1)
      == -1000000L)
    // tie-averaging: x = (1,1,2,2), y = (1,2,3,4). Doubled ranks
    // r2x = (3,3,7,7) (tied pairs share the averaged rank), r2y =
    // (2,4,6,8). Pearson over those: num = 4·116 − 20·20 = 64;
    // denx = 4·116 − 400 = 64; deny = 4·120 − 400 = 80;
    // rho = 64/√(64·80) = √(4/5) ≈ 0.8944272.
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0))
      .toDF("x", "y")
    assert(StatsOps.spearman(tied, "x", "y").collect().head.getLong(1)
      == 894427L)
  }

  test("chiSquareCells: independent margins give zero statistic, full spine") {
    // perfectly independent 2×2: every cell count = expected
    val rows = Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(2)(("b", "y"))
    val out = StatsOps.chiSquareCells(rows.toDF("u", "v"), "u", "v").collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(4) == 0L), s"chi terms: ${out.toSeq}")
    assert(out.forall(_.getLong(3) == 2000000L)) // every expected = 2
  }

  test("chiSquareCells: an absent cell still surfaces with its expected count") {
    // u=b never pairs with v=y → the (b, y) cell must appear at n_obs=0
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("u", "v")
    val out = StatsOps.chiSquareCells(df, "u", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("b", "y")) == 0L)
    assert(out.size == 4)
  }

  test("cramersV: perfect association scores exactly 1, independence 0") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val p = StatsOps.cramersV(perfect, "u", "v").collect().head
    assert(p.getAs[Long]("v_micro") == 1000000L, s"perfect: $p")
    assert(p.getAs[Long]("dof") == 1L)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    assert(StatsOps.cramersV(indep, "u", "v").collect().head
      .getAs[Long]("v_micro") == 0L)
  }

  test("mutualInfoCells: independence gives zero terms; a copy gives ln(k)") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    assert(StatsOps.mutualInfoCells(indep, "u", "v").collect()
      .forall(_.getAs[Long]("mi_term_e12") == 0L))
    // y ≡ x over 2 symbols: I = ln 2 ≈ 0.693147... nats
    val copy = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b"))
      .toDF("u", "v")
    val mi = StatsOps.mutualInfoCells(copy, "u", "v").collect()
      .map(_.getAs[Long]("mi_term_e12")).sum
    assert(math.abs(mi - math.round(math.log(2.0) * 1e12)) <= 2L, s"mi: $mi")
  }

  test("kendallTauB: perfect concordance is +1; ties discount the denominator") {
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    assert(StatsOps.kendallTauB(perfect, "x", "y").collect().head
      .getAs[Long]("tau_micro") == 1000000L)
    // x = (1,1,2), y = (1,2,3): nc = 2, nd = 0; n₀×2 = 6, ties give
    // n₁×2 = 2, n₂×2 = 0 → τ = 2/√((4/2)·(6/2)) = 2/√6 ≈ 0.816497
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val r = StatsOps.kendallTauB(tied, "x", "y").collect().head
    assert(r.getAs[String]("nc") == "2" && r.getAs[String]("nd") == "0")
    assert(r.getAs[Long]("tau_micro") == 816497L, s"tau: $r")
  }

  test("mannWhitney: a clean separation maximizes U and crosses the 5% bar") {
    // A = {10,20,30} strictly above B = {1,2,3}: 2U_a = 18 (= 2·n_a·n_b),
    // z = 9 / (2·√(9/12·7)) = 1.963961 — just over 1.96
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 1L), ("b", 2L), ("b", 3L)).toDF("s", "v")
    val r = StatsOps.mannWhitney(df, "s", "a", "b", "v").collect().head
    assert(r.getAs[String]("u2_a") == "18")
    assert(r.getAs[Long]("z_micro") == 1963961L, s"z: $r")
    assert(r.getAs[Boolean]("reject"))
    // identical slices: U at its mean, z exactly 0
    val same = Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L)).toDF("s", "v")
    val r2 = StatsOps.mannWhitney(same, "s", "a", "b", "v").collect().head
    assert(r2.getAs[Long]("z_micro") == 0L && !r2.getAs[Boolean]("reject"))
  }

  test("robustZscore: one wild value can't mask itself — median/MAD catch it") {
    // 1..9 plus 1000: med = 5, MAD = 2; z(1000) = 0.6745·995/2 ≫ 3.5,
    // z(1) = z(9) = 1.349 — exactly one outlier
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("t", _)).toDF("k", "v")
    val r = StatsOps.robustZscore(df, "k", "v").collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("med_micro") == 5000000L)
    assert(r.getAs[Long]("mad_micro") == 2000000L)
    assert(r.getAs[Long]("n_outliers") == 1L, s"outliers: $r")
  }

  test("robustZscore: zero MAD counts every off-median value as an outlier") {
    val df = Seq(("t", 5.0), ("t", 5.0), ("t", 5.0), ("t", 7.0)).toDF("k", "v")
    val r = StatsOps.robustZscore(df, "k", "v").collect().head
    assert(r.getAs[Long]("mad_micro") == 0L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("trimmedMean: the 10% trim drops exactly the extreme observations") {
    // 1..9 + 1000: k = 1 each side → mean of 2..9 = 5.5; plain = 104.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("t", _)).toDF("k", "v")
    val r = StatsOps.trimmedMean(df, "k", "v").collect().head
    assert(r.getAs[Long]("k_trim") == 1L)
    assert(r.getAs[Long]("mean_micro") == 104500000L)
    assert(r.getAs[Long]("trimmed_mean_micro") == 5500000L, s"trim: $r")
  }

  test("giniCard: uniform counts give 0; total concentration approaches 1−1/n") {
    val uniform = Seq(("s", "a", 5L), ("s", "b", 5L), ("s", "c", 5L), ("s", "d", 5L))
      .toDF("src", "item", "c")
    assert(StatsOps.giniCard(uniform, "src", "item", "c").collect().head
      .getAs[Long]("gini_micro") == 0L)
    // one item carries ~everything: G → (n−1)/n · (1 − tail correction)
    val skew = Seq(("s", "a", 1L), ("s", "b", 1L), ("s", "c", 1L), ("s", "d", 997L))
      .toDF("src", "item", "c")
    val g = StatsOps.giniCard(skew, "src", "item", "c").collect().head
      .getAs[Long]("gini_micro")
    // exact: (2·(1+2+3+4·997)−5·1000)/(4·1000) = (2·3994−5000)/4000
    assert(g == (2L * 3994L - 5L * 1000L) * 1000000L / 4000L, s"gini: $g")
  }
}
