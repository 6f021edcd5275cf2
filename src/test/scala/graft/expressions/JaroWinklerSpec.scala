package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def jw(a: String, b: String): Long =
    JaroWinkler.micro(UTF8String.fromString(a), UTF8String.fromString(b))

  test("pinned values match DuckDB's jaro_winkler_similarity micro-rounded") {
    // each literal was read off round(jaro_winkler_similarity(a,b)*1e6)
    assert(jw("martha", "marhta") == 961111L)
    assert(jw("dixon", "dicksonx") == 813333L)
    assert(jw("crate", "trace") == 733333L)
    assert(jw("dwayne", "duane") == 840000L)
    assert(jw("prefixmatch", "prefixmatcx") == 963636L)
    // short strings: window max(⌊2/2⌋−1,0)=0 ⇒ no cross-position match
    assert(jw("ab", "ba") == 0L)
    assert(jw("abcdef", "abcdef") == 1000000L)
    // empty input is 0 — including both-empty (the DuckDB convention)
    assert(jw("a", "") == 0L)
    assert(jw("", "") == 0L)
  }

  test("boost applies at jaro exactly 0.7 (the >= boundary)") {
    // one char vs 10 starting with it: m=1, t=0, jaro=(1+0.1+1)/3=0.7,
    // prefix 1 ⇒ 0.7 + 0.1·0.3 = 0.73 (DuckDB returns 0.73 here too)
    assert(jw("c", "caddddcebc") == 730000L)
  }

  test("SQL registration: jaro_winkler_micro resolves after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler_micro('martha', 'marhta') AS m").head.getLong(0)
    assert(r == 961111L)
  }

  test("codegen path agrees with the static method on randomized pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def s() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val pairs = (0 until 300).map(_ => (s(), s()))
    val got = pairs.toDF("a", "b")
      .selectExpr("a", "b", "jaro_winkler_micro(a, b) AS m")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == jw(a, b), s"mismatch on ($a, $b)")
    }
  }

  test("nulls propagate") {
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT jaro_winkler_micro(CAST(NULL AS STRING), 'x') AS m")
      .head.isNullAt(0))
  }
}
