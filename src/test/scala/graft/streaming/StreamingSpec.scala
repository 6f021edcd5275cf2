package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.core.Types

/** Streaming operators driven through MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val M: Long = 60L * 1000000L

  test("streaming sessionization closes sessions on event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Types.utcMicros(2024, 1, 1) // away from the epoch-0 initial watermark
    val input = MemoryStream[StreamingSessions.SessionEvent]

    val withTime = input.toDS()
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", "0 seconds")
      .as[StreamingSessions.SessionEvent]
    val sessions = StreamingSessions.sessionize(withTime, gapUs = 30 * M)

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events 10min apart (one open session)
      input.addData(
        StreamingSessions.SessionEvent(1L, base, 1L),
        StreamingSessions.SessionEvent(1L, base + 10 * M, 2L))
      q.processAllAvailable()
      // batch 2: an event 60min later → closes session 1 inline
      input.addData(StreamingSessions.SessionEvent(1L, base + 70 * M, 3L))
      q.processAllAvailable()

      val rows = spark.table("sessions_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events")))
      assert(rows.toSeq == Seq((1L, base, base + 10 * M, 2L)))
    } finally q.stop()
  }

  test("streaming billing folds the same state machine incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val start = Types.utcMicros(2024, 1, 1)
    val end = Types.utcMicros(2024, 2, 1)
    val input = MemoryStream[StreamingBilling.VmAction]

    val totals = StreamingBilling.runtimeTotals(input.toDS(), start, end)
    val q = totals.writeStream
      .format("memory").queryName("billing_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: create at t0, stop 40min later
      input.addData(
        StreamingBilling.VmAction("vm-1", start, "create", ""),
        StreamingBilling.VmAction("vm-1", start + 40 * M, "stop", ""))
      q.processAllAvailable()
      val r1 = spark.table("billing_out").collect().last
      assert(r1.getAs[String]("current_state") == "Stopped")
      assert(r1.getAs[Long]("running_us") == 40 * M)

      // batch 2: start again 1h in, delete at 2h — total 40min + 1h
      input.addData(
        StreamingBilling.VmAction("vm-1", start + 60 * M, "start", ""),
        StreamingBilling.VmAction("vm-1", start + 120 * M, "delete", ""))
      q.processAllAvailable()
      val r2 = spark.table("billing_out").collect().last
      assert(r2.getAs[String]("current_state") == "Deleted")
      assert(r2.getAs[Long]("running_us") == 100 * M)
      assert(r2.getAs[Long]("stopped_us") == 20 * M)
    } finally q.stop()
  }
}
