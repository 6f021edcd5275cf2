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
      println(f"[profile] $name%-26s ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$n")
    }
    val docs = graft.etl.Ingest.table(spark, dir, "documents")
    val sh = DedupOps.shingled(docs).cache()
    sh.count()
    time("sh cached count")(sh.count())
    val pairs = DedupOps.candidatePairs(DedupOps.lshBands(DedupOps.minhashSignature(sh)))
    time("pairs from cached sh")(pairs.count())
    time("pairs again")(pairs.count())
    val pc = pairs.cache(); pc.count()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("counts")(counts.count())
    val common = pc
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    time("common (2 joins)")(common.count())
    time("full jaccard")(DedupOps.ngramJaccard(pc, sh).count())
    time("full jaccard again")(DedupOps.ngramJaccard(pc, sh).count())
    spark.stop()
  }
}
