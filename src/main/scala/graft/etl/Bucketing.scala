package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §4 / the 100 TB
  * design rules): two facts bucketed+sorted on the same join key join
  * with ZERO shuffle — each bucket pair streams through a sort-merge
  * join. At 100 TB this turns the dominant recurring cost (re-shuffling
  * the fact table for every downstream join) into a one-time layout
  * decision at write time.
  *
  * Bucket count guidance: aim for buckets of 100-500 MB at the target
  * scale (100 TB / 256 MB ≈ 400k buckets is too many files — in practice
  * bucket by the join key at 2-4× total executor cores and rely on AQE
  * partition coalescing for the tail).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Join two equi-bucketed tables on their bucket key — planner emits a
    * shuffle-free sort-merge join when both sides' bucket specs line up.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
