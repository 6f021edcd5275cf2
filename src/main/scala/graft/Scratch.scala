package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Throwaway timing harness for the jaccard sub-pipeline (deleted before
  * round end).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.min}%.3f s (rows=${f})")
    }
    val docs = graft.etl.Ingest.table(spark, dir, "documents")
    val bands = DedupOps.lshBands(
      DedupOps.minhashSignature(DedupOps.shingledAll(docs))).cache()
    t("bands")(bands.count())
    val pairs = DedupOps.candidatePairs(bands).cache()
    t("pairs")(pairs.count())
    val docsets = DedupOps.candidateShingleSets(pairs, docs).cache()
    t("docsets")(docsets.count())
    t("jaccard")(DedupOps.ngramJaccardSets(pairs, docsets).count())
    spark.stop()
  }
}
