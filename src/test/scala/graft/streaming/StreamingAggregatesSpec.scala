package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.core.Types

class StreamingAggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val base: Long = Types.utcMicros(2024, 1, 1)
  val S: Long = 1000000L

  test("windowed streaming aggregation emits completed windows after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDS().toDF("ts_us", "event_type", "value")
      .withColumn("ets", timestamp_micros(col("ts_us")))

    val agg = StreamingAggregates.windowedEventStats(events, windowSeconds = 60, latenessSeconds = 0)
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((base + 5 * S, "click", 2.0), (base + 20 * S, "click", 3.0),
        (base + 30 * S, "view", 1.0))
      q.processAllAvailable()
      // advance event time past window end + watermark → first window closes
      input.addData((base + 200 * S, "click", 1.0))
      q.processAllAvailable()

      val rows = spark.table("win_out").collect()
        .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("sum_value").toPlainString))
        .toSet
      assert(rows == Set(
        (base, "click", 2L, "5.00"),
        (base, "view", 1L, "1.00")))
    } finally q.stop()
  }

  test("streaming dedup drops replays within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = input.toDS().toDF("ts_us", "dedup_key")
      .withColumn("ets", timestamp_micros(col("ts_us")))

    val dedup = StreamingAggregates.dedupStream(events, latenessSeconds = 3600)
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((base, "doc-a"), (base + S, "doc-a"), (base + 2 * S, "doc-b"))
      q.processAllAvailable()
      input.addData((base + 3 * S, "doc-a"), (base + 4 * S, "doc-c")) // replay + new
      q.processAllAvailable()
      val keys = spark.table("dedup_out").collect().map(_.getAs[String]("dedup_key"))
      assert(keys.sorted.toSeq == Seq("doc-a", "doc-b", "doc-c"))
    } finally q.stop()
  }
}
