package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Assumptions about the driver-generated testdata that queries' oracle
  * equivalence silently depends on — asserted so a future testdata change
  * fails HERE with an explanation instead of as an opaque oracle
  * hash-mismatch at scoring time.
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every query has an oracle, except the explicit rows-only whitelist") {
    // the driver's correctness gate hash-compares queries against
    // oracleSql; a query added without an oracle silently downgrades to
    // a rows-only check — this pins the whitelist so that never happens
    // unnoticed
    // empty since r3: a5_approx_sketches gained a bounds oracle (exact
    // distinct + rated-error verdict booleans), so every query is now
    // hash-checked
    val rowsOnly = Set.empty[String]
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle entries without a matching query")
  }

  test("documents are pure ASCII: mm oracles slice chars, Spark slices bytes") {
    // mm_frames / mm_resize DuckDB oracles use substr on TEXT (character
    // positions — DuckDB cannot slice BLOBs) while the Spark side slices
    // PAYLOAD BYTES; they agree iff chars == bytes, i.e. ASCII-only text.
    val nonAscii = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) =!= length(encode(col("text"), "UTF-8")))
      .count()
    assert(nonAscii == 0,
      "non-ASCII documents break the byte/char equivalence the mm_* oracles rely on")
  }
}
