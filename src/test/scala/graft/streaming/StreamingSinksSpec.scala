package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestSession

class StreamingSinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("foreachBatch sink is idempotent per batchId: a replayed batch replaces itself") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-fb").toString + "/t"
    val input = MemoryStream[(Long, String)]
    val q = StreamingSinks
      .idempotentParquetSink(input.toDS().toDF("id", "v").as[(Long, String)], out)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3)

      // simulate the at-least-once replay: re-deliver batch 1's rows
      // through the SAME write function with the SAME batchId — the
      // partition overwrites itself, never appends
      StreamingSinks.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L, out)
      val rows = spark.read.parquet(out).select("id").as[Long].collect().sorted
      assert(rows.toSeq == Seq(1L, 2L, 3L)) // still 3 rows, batch 1 replaced in place
    } finally q.stop()
  }
}
