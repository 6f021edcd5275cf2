package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the kNN-graph head-recall CONTRACT at a chosen
  * scale: builds the default graph surface's arcs through
  * [[graft.ops.SimilarityOps.knnGraphAtHeadRecall]] and prints either
  * the arc count (contract met) or the named raise (contract failed,
  * with the frontier's table-count fix). This is how a user prices the
  * r11 recall-decay finding AT THEIR OPERATING SCALE before wiring the
  * graph into downstream analytics:
  *
  *   runMain graft.RecallProbe <sfDir> [threshold] [k] [minHeadRecall]
  *
  * e.g. the round-12 PLANS demonstration: contract 0.9 at sf0.01
  * (passes, head recall ≈ 0.99) vs the same contract on a ×10 copy
  * (fails by name — the synthetic corpus's whole top-8 sits at
  * cos 0.39–0.43, sign-LSH's hardest regime).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.25)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val contract = args.lift(3).map(_.toDouble).getOrElse(0.9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = ops.SimilarityOps.withNorm(
      etl.Ingest.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")))
    try {
      val arcs = ops.SimilarityOps.knnGraphAtHeadRecall(
        emb, threshold, k, contract, calibQueries = 20)
      println(s"[recall-probe] CONTRACT MET at $dir " +
        s"(threshold=$threshold, k=$k, min=$contract): " +
        s"${arcs.count()} arcs")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[recall-probe] CONTRACT RAISED at $dir: ${e.getMessage}")
    }
    spark.stop()
  }
}
