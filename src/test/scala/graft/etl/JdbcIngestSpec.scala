package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** S1's live-database path, exercised against an embedded in-memory Derby
  * (the JDBC engine Spark itself ships for its Hive metastore): proves
  * `Ingest.jdbcTable` really reads a live DB, splits the scan into the
  * requested numeric range partitions, and pushes filters into the
  * source's SQL instead of fetching the table whole — the properties that
  * matter when the URL points at a production Nova MySQL.
  */
class JdbcIngestSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  test("jdbcTable: live read, range partitioning, filter pushdown") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    // getConnection also registers the embedded driver with DriverManager,
    // which is how Spark's JDBC source then resolves it
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE instances (id INT PRIMARY KEY, uuid VARCHAR(36), vcpus INT)")
      val ins = conn.prepareStatement("INSERT INTO instances VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"u$i"); ins.setInt(3, i % 8)
        ins.addBatch()
      }
      ins.executeBatch()

      val df = Ingest.jdbcTable(spark, url, "instances", "id",
        lowerBound = 1, upperBound = 101, numPartitions = 4)
      assert(df.count() == 100)
      // the bounds split into 4 ranged queries = 4 scan partitions
      assert(df.rdd.getNumPartitions == 4)

      // Derby uppercases identifiers; the filter must reach the source
      // (PushedFilters in the scan node), not run as a Spark-side Filter
      // over a full fetch
      val filtered = df.filter(col("VCPUS") === 3)
      assert(filtered.count() == 13)
      val scan = filtered.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") && scan.contains("VCPUS"),
        s"filter did not push into the JDBC scan:\n$scan")
    } finally conn.close()
  }
}
