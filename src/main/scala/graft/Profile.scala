package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = graft.etl.Ingest.table(spark, dir, "documents")
    docs.count()
    time("shingled codegen (w/dist)")(DedupOps.shingled(docs).count())
    time("shingled again")(DedupOps.shingled(docs).count())
    val sh = DedupOps.shingled(docs)
    time("signature uncached sh")(DedupOps.minhashSignature(sh).count())
    val bands = DedupOps.lshBands(DedupOps.minhashSignature(sh))
    time("buckets uncached")(DedupOps.lshBuckets(bands).count())
    time("pairs uncached")(DedupOps.candidatePairs(bands).count())
    DedupOps.candidatePairs(bands).explain("formatted")
    spark.stop()
  }
}
