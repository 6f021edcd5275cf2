package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.JoinOps

/** The native (custom LogicalPlan + Strategy + SparkPlan) as-of join:
  * semantics identical to the compositional sweep, plan shape as
  * declared, pushdown rule active.
  */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.expressions.GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  private def leftSmall = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
    .toDF("key", "ts_us", "tag")
  private def rightSmall = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 60L, 30L))
    .toDF("key", "rts", "v")

  test("prior: greatest right ts <= left ts per key, inclusive tie") {
    val out = AsOfJoin.prior(leftSmall, rightSmall, "key", "ts_us", "rts", Seq("v"))
      .select("key", "ts_us", "tag", "asof_ts", "v")
      .as[(Long, Long, String, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      (1L, 100L, "a", Some(100L), Some(10L)),
      (1L, 250L, "b", Some(200L), Some(20L)),
      (2L, 50L, "c", None, None)))
  }

  test("next: smallest right ts >= left ts per key, inclusive tie") {
    val out = AsOfJoin.next(leftSmall, rightSmall, "key", "ts_us", "rts", Seq("v"))
      .select("key", "ts_us", "asof_ts", "v")
      .as[(Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      (1L, 100L, Some(100L), Some(10L)),
      (1L, 250L, None, None),
      (2L, 50L, Some(60L), Some(30L))))
  }

  test("null keys and null timestamps never match; null-key lefts survive") {
    val left = Seq((Option.empty[Long], Some(100L)), (Some(1L), Some(100L)),
      (Some(1L), Option.empty[Long])).toDF("key", "ts_us")
    val right = Seq((Option.empty[Long], Some(50L), 9L),
      (Some(1L), Option.empty[Long], 8L), (Some(1L), Some(50L), 5L))
      .toDF("key", "rts", "v")
    val out = AsOfJoin.prior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("key", "ts_us", "v")
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(out === Set(
      (None, Some(100L), None),        // null key: no match
      (Some(1L), Some(100L), Some(5L)), // matches rts=50 (null rts skipped)
      (Some(1L), None, None)))          // null left ts: no match
  }

  test("matched row's own null value survives (no stale patch-through)") {
    val left = Seq((1L, 150L)).toDF("key", "ts_us")
    val right = Seq((1L, 50L, Some(7L)), (1L, 100L, Option.empty[Long]))
      .toDF("key", "rts", "v")
    val out = AsOfJoin.prior(left, right, "key", "ts_us", "rts", Seq("v"))
      .select("asof_ts", "v").as[(Option[Long], Option[Long])].collect()
    assert(out === Array((Some(100L), None)))
  }

  test("bitwise parity with the sweep form on real tables, both directions") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.etl.Ingest.table(spark, dir, "events").select(
      col("event_id"), col("user_id").as("key"), unix_micros(col("ts")).as("ts_us"))
    val day = graft.etl.Ingest.table(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), unix_micros(col("o_orderdate")).as("ots"))
      .agg(count(lit(1)).as("day_orders"))
    for (forward <- Seq(false, true)) {
      val native =
        if (forward) AsOfJoin.next(ev, day, "key", "ts_us", "ots", Seq("day_orders"))
        else AsOfJoin.prior(ev, day, "key", "ts_us", "ots", Seq("day_orders"))
      val sweep =
        if (forward) JoinOps.asofJoinNext(ev, day, "key", "ts_us", "ots", Seq("day_orders"))
        else JoinOps.asofJoinPrior(ev, day, "key", "ts_us", "ots", Seq("day_orders"))
      val cols = Seq("event_id", "key", "ts_us", "asof_ts", "day_orders")
      assert(native.select(cols.map(col): _*).exceptAll(
        sweep.select(cols.map(col): _*)).isEmpty)
      assert(sweep.select(cols.map(col): _*).exceptAll(
        native.select(cols.map(col): _*)).isEmpty)
    }
  }

  test("plans as AsOfJoinExec: one exchange + sort per side, no window") {
    val p = AsOfJoin.prior(leftSmall, rightSmall, "key", "ts_us", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Window"), p)
  }

  test("left-only filters push below the join (custom optimizer rule)") {
    val joined = AsOfJoin.prior(leftSmall, rightSmall, "key", "ts_us", "rts", Seq("v"))
      .filter(col("tag") === "a" && col("v").isNotNull)
    val opt = joined.queryExecution.optimizedPlan
    // the tag conjunct must sit BELOW AsOfJoinNode, the v conjunct above
    val aj = opt.collectFirst { case n: AsOfJoinNode => n }.get
    assert(aj.left.toString.contains("tag"), opt.toString)
    val above = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(above.exists(_.condition.toString.contains("isnotnull(v")), opt.toString)
    // and results match the unpushed semantics
    val rows = joined.select("key", "ts_us", "v").as[(Long, Long, Long)].collect()
    assert(rows === Array((1L, 100L, 10L)))
  }
}
