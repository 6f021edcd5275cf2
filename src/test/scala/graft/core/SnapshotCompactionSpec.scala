package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core.Types.BillingEvent
import graft.sql.RuntimeSql

/** Compaction correctness: snapshot(prefix) + tail must equal the full
  * fold — typed and relational formulations both.
  */
class SnapshotCompactionSpec extends AnyFunSuite {

  val start: Long = Types.utcMicros(2024, 1, 1)
  val end: Long = Types.utcMicros(2024, 2, 1)
  val span: Long = end - start

  private val actions = Array("create", "start", "stop", "delete", "shelve",
    "unshelve", "volume_attach")

  private def randomLog(rnd: scala.util.Random, n: Int): List[BillingEvent] =
    List.fill(n) {
      val t = start - span + (rnd.nextDouble() * 2 * span).toLong
      BillingEvent((t / 60000000L) * 60000000L,
        actions(rnd.nextInt(actions.length)),
        if (rnd.nextInt(6) == 0) "Error" else "")
    }.sortBy(_.timeUs)

  test("typed: snapshot(prefix) + tail == full fold, any compaction point <= start") {
    val rnd = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      val log = randomLog(rnd, rnd.nextInt(16))
      val t0 = start - (rnd.nextDouble() * span).toLong // any t0 <= start
      val (prefix, tail) = log.partition(_.timeUs <= t0)
      val del = if (rnd.nextBoolean())
        Some(log.lastOption.map(_.timeUs).getOrElse(start) + 3600000000L) else None

      val full = StateMachine.runtimeDuring(log, del, start, end)
      val compacted = Compaction.runtimeFromSnapshot(
        Compaction.snapshotState(prefix), tail, del, start, end)
      assert(compacted == full,
        s"compaction mismatch at t0=$t0: $compacted != $full\nlog=$log del=$del")
    }
  }

  test("relational: snapshots(prefix) seeded into tail == stateRuns over everything") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val t0 = start - span / 10

    val logs = (0 until 40).map(k => k.toLong -> randomLog(rnd, rnd.nextInt(16)))
    def shaped(evs: Seq[(Long, BillingEvent)]) = evs.zipWithIndex.map {
      case ((k, e), i) => (k, mapStateStr(e), e.timeUs, i.toLong)
    }.toDF("key", "state", "ts_us", "tie").filter($"state".isNotNull)

    def mapStateStr(e: BillingEvent): String =
      if (e.message == "Error") "Error"
      else StateMachine.TriggerToState.get(e.name).orNull

    val all = logs.flatMap { case (k, log) => log.map(k -> _) }
    val prefix = all.filter(_._2.timeUs <= t0)
    val tail = all.filter(_._2.timeUs > t0)

    val fullRt = RuntimeSql.runtimeInWindow(
      RuntimeSql.stateRuns(shaped(all)), start, end)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val snaps = RuntimeSql.snapshots(shaped(prefix))
    val seeded = RuntimeSql.seededEvents(shaped(tail), snaps, t0)
    val compRt = RuntimeSql.runtimeInWindow(
      RuntimeSql.stateRuns(seeded), start, end)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(compRt == fullRt)
  }
}
