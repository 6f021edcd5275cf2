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
