package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment harness (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.expressions.GraftExtensions.register(spark)
    graft.etl.Ingest.table(spark, dir, "orders").createOrReplaceTempView("orders_v")
    graft.etl.Ingest.table(spark, dir, "customer").createOrReplaceTempView("customer_v")

    val pruned = spark.sql(
      """SELECT c_custkey, c_name FROM customer_v
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(o_custkey), 100000L)
        |   FROM orders_v WHERE o_totalprice > 450),
        |  xxhash64(c_custkey))""".stripMargin)
    println("pruned rows = " + pruned.count())
    val exact = spark.sql(
      """SELECT c_custkey FROM customer_v WHERE EXISTS (
        |  SELECT 1 FROM orders_v
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450)""".stripMargin)
    println("exact rows = " + exact.count())

    // tumbling + sliding window sanity
    val ev = graft.etl.Ingest.table(spark, dir, "events")
    val tumb = ev.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"), col("n"))
    tumb.orderBy("win_start_us").show(3)
    val slide = ev.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"), col("n"))
    println("slide rows=" + slide.count() + " tumb rows=" + tumb.count())
    spark.stop()
  }
}
