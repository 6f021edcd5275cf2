package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.core.Types

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val M: Long = 60L * 1000000L

  test("streaming dedup emits the first arrival per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Types.utcMicros(2024, 1, 1)
    val input = MemoryStream[(Long, Long, String)]

    val docs = input.toDS()
      .toDF("doc_id", "ts_us", "text")
      .withColumn("ets", timestamp_micros(col("ts_us")))
    val out = StreamingDedup.firstArrivals(docs, "ets", "10 minutes")

    val q = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two distinct docs + one in-batch duplicate
      input.addData(
        (1L, base, "alpha beta"),
        (2L, base + 1 * M, "gamma"),
        (3L, base + 2 * M, "alpha beta"))
      q.processAllAvailable()
      // batch 2: duplicate of doc 2 within the watermark window
      input.addData((4L, base + 3 * M, "gamma"))
      q.processAllAvailable()

      val ids = spark.table("dedup_out").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L)) // 3 and 4 dropped as duplicates
    } finally q.stop()
  }
}
