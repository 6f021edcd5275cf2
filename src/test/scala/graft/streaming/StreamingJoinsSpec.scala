package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.core.Types

class StreamingJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val M: Long = 60L * 1000000L

  test("stream-stream join matches right events within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Types.utcMicros(2024, 1, 1)

    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long, String)]
    val l = lIn.toDS().toDF("key", "l_us")
      .withColumn("l_ts", timestamp_micros(col("l_us")))
    val r = rIn.toDS().toDF("key", "r_us", "tag")
      .withColumn("r_ts", timestamp_micros(col("r_us")))

    // 5-minute match window
    val joined = StreamingJoins.joinWithin(l, r, "key", "l_ts", "r_ts", 300L)

    val q = joined.writeStream
      .format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      lIn.addData((1L, base), (2L, base))
      rIn.addData(
        (1L, base + 2 * M, "in_window"),
        (1L, base + 20 * M, "too_late"),
        (2L, base - 1 * M, "before_left"),
        (3L, base + 1 * M, "no_left_key"))
      q.processAllAvailable()

      val tags = spark.table("ssj_out").collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[String]("tag"))).toSet
      assert(tags === Set((1L, "in_window")))
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim joins each micro-batch, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Long)]
    val enriched = in.toDS().toDF("event_id", "user_id")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream
      .format("memory").queryName("ss_enrich")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((100L, 1L), (101L, 3L))
      q.processAllAvailable()
      val got = spark.table("ss_enrich").collect()
        .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(got == Map(100L -> Some("gold"), 101L -> None)) // unmatched kept
    } finally q.stop()
  }

  test("late right-side rows past the watermark are dropped from state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Types.utcMicros(2024, 2, 1)

    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long, String)]
    val l = lIn.toDS().toDF("key", "l_us")
      .withColumn("l_ts", timestamp_micros(col("l_us")))
    val r = rIn.toDS().toDF("key", "r_us", "tag")
      .withColumn("r_ts", timestamp_micros(col("r_us")))

    val joined = StreamingJoins.joinWithin(l, r, "key", "l_ts", "r_ts", 300L, "2 minutes")

    val q = joined.writeStream
      .format("memory").queryName("ssj_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // advance both watermarks far past base: base+60min − 2min delay
      lIn.addData((9L, base + 60 * M))
      rIn.addData((9L, base + 60 * M, "advance"))
      q.processAllAvailable()
      // now a left row AT base is already behind the watermark; a right
      // match for it is dropped rather than buffered forever
      lIn.addData((1L, base))
      rIn.addData((1L, base + 1 * M, "late"))
      q.processAllAvailable()

      val tags = spark.table("ssj_late").collect()
        .map(_.getAs[String]("tag")).toSet
      assert(!tags.contains("late"))
    } finally q.stop()
  }
}
