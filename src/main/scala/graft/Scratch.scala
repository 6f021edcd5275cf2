package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Throwaway experiment harness (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.etl.Ingest.table(spark, dir, "documents")
    val bands = DedupOps.lshBands(
      DedupOps.minhashSignature(DedupOps.shingledAll(docs))).cache()
    bands.count()
    val pairs = DedupOps.candidatePairs(bands).cache()
    println("pairs=" + pairs.count())
    // edge stats: component sizes via driver-side union-find (ground truth)
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    es.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val comps = parent.keys.groupBy(find).map(_._2.size)
    println(s"components=${comps.size} maxsize=${if (comps.nonEmpty) comps.max else 0}")
    (1 to 2).foreach { _ =>
      val t0 = System.nanoTime()
      DedupOps.duplicateClusters(docs.select("doc_id"), pairs).count()
      println(f"clusters: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
