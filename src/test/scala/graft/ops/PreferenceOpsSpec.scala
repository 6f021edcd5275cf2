package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.SparkTestSession

class PreferenceOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("pairsFromLog: transition direction, event_id tie-break, same-type dropped") {
    val events = Seq(
      // user 1: a →(tie on ts, e2 before e3)→ b → a
      (1L, ts(10), 1L, "a"),
      (1L, ts(20), 2L, "b"),
      (1L, ts(20), 3L, "a"),
      // user 2: a → a collapses (no self-preference)
      (2L, ts(10), 4L, "a"),
      (2L, ts(20), 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = PreferenceOps.pairsFromLog(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("b", "a", 1L), ("a", "b", 1L)))
  }

  test("btStrengths: hand-replayed MM chain on a 3:1 record") {
    val pairs = Seq(("a", "b", 3L), ("b", "a", 1L)).toDF("winner", "loser", "n")
    val out = PreferenceOps.btStrengths(pairs, iters = 3)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // iter 1: denom = 4/2 = 2 → raw (1.5, 0.5) → (0.75, 0.25);
    // iter 2: denom = 4/1 = 4 → raw (0.75, 0.25) → fixed point.
    assert(out("a") == ((3L, 4L, 0.75)))
    assert(out("b") == ((1L, 4L, 0.25)))
  }

  test("btStrengths: zero-win item converges to strength 0") {
    val pairs = Seq(("a", "b", 2L)).toDF("winner", "loser", "n")
    val out = PreferenceOps.btStrengths(pairs, iters = 3)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((2L, 2L, 1.0)))
    assert(out("b") == ((0L, 2L, 0.0)))
  }

  test("btStrengths: strengths sum to 1 and order follows win rate on testdata-shaped input") {
    val pairs = Seq(
      ("x", "y", 9L), ("y", "x", 1L),
      ("y", "z", 8L), ("z", "y", 2L),
      ("x", "z", 7L), ("z", "x", 3L)
    ).toDF("winner", "loser", "n")
    val rows = PreferenceOps.btStrengths(pairs, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(rows.values.sum - 1.0) < 1e-5, rows)
    assert(rows("x") > rows("y") && rows("y") > rows("z"), rows)
  }
}
