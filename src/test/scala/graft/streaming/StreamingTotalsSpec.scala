package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession

class StreamingTotalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("transformWithState accumulates per-key totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamingTotals.Spend]
    val out = StreamingTotals.runningTotals(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("totals_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(
        StreamingTotals.Spend(1L, 100L),
        StreamingTotals.Spend(1L, 50L),
        StreamingTotals.Spend(2L, 10L))
      q.processAllAvailable()
      input.addData(StreamingTotals.Spend(1L, 25L))
      q.processAllAvailable()

      val rows = spark.table("totals_out")
        .as[StreamingTotals.RunningTotal].collect().toSet
      // batch 1 updates: user 1 folded both events, user 2 one;
      // batch 2: user 1's state carried across the batch boundary
      assert(rows == Set(
        StreamingTotals.RunningTotal(1L, 2L, 150L),
        StreamingTotals.RunningTotal(2L, 1L, 10L),
        StreamingTotals.RunningTotal(1L, 3L, 175L)))
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
