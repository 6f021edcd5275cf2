package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partitioned-layout contract behind src5_partitioned_roundtrip:
  * partition values become directories, a partition filter prunes at
  * planning time, and pruning loses nothing.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val out =
    java.nio.file.Files.createTempDirectory("graft-partlayout").toString

  private lazy val written = {
    Seq(
      (1L, "click", 1.5), (2L, "click", 2.5), (3L, "view", 3.5),
      (4L, "purchase", 4.5), (5L, "error", 5.5))
      .toDF("id", "etype", "v")
      .write.mode("overwrite").partitionBy("etype").parquet(out)
    out
  }

  test("partition values become directories") {
    val dirs = new java.io.File(written).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("etype=click", "etype=view", "etype=purchase",
      "etype=error"))
  }

  test("a partition filter reaches PartitionFilters and prunes the scan") {
    val df = spark.read.parquet(written).filter(col("etype") === "click")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("etype"),
      p.linesIterator.take(20).mkString("\n"))
    // the pruned scan reads exactly the matching directory's rows
    assert(df.count() == 2)
    // and the file list it touched excludes other partitions
    val files = df.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("etype=click")))
  }

  test("pruning loses nothing: partitioned filter equals in-memory filter") {
    val part = spark.read.parquet(written)
      .filter(col("etype").isin("click", "purchase"))
      .select("id").as[Long].collect().toSet
    assert(part == Set(1L, 2L, 4L))
  }
}
