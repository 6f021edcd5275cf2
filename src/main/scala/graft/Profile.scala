package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("dedup_embedding")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("[reuse] contains ReusedExchange/StageReuse: " +
      (plan.contains("ReusedExchange") || plan.contains("reused")))
    println(plan.split("\n").filter(l => l.contains("Exchange") || l.contains("Scan parquet") || l.contains("reused")).mkString("\n"))
    spark.stop()
  }
}
