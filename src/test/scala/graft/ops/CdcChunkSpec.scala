package graft.ops

import org.apache.spark.sql.functions.{col, split}
import org.scalatest.funsuite.AnyFunSuite

class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val boiler = (0 until 40).map(i => s"b$i").mkString(" ")

  private def dups(docs: Seq[(Long, String)]) =
    DedupOps.cdcDuplicateChunks(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("toks")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("identical documents share every chunk") {
    val out = dups(Seq((1L, boiler), (2L, boiler)))
    assert(out.nonEmpty)
    assert(out.values.forall { case (nc, nd, fd) =>
      nc == 2L && nd == 2L && fd == 1L })
  }

  test("shared boilerplate is found at DIFFERENT offsets (content-defined)") {
    // same 40-token boilerplate after different-length unique prefixes:
    // fixed-width chunking would misalign every boundary; content cuts
    // realign inside the shared run
    val out = dups(Seq(
      (1L, s"u1 u2 u3 $boiler"),
      (2L, s"v1 v2 v3 v4 v5 v6 v7 v8 v9 $boiler")))
    assert(out.exists(_._2._2 == 2L),
      "at least one interior boilerplate chunk must dedup across docs")
  }

  test("an insertion shifts no downstream chunks") {
    val a = dups(Seq((1L, boiler), (2L, s"inserted $boiler")))
    assert(a.exists(_._2._2 == 2L))
    // unique content shares nothing
    val b = dups(Seq(
      (1L, (0 until 40).map(i => s"x$i").mkString(" ")),
      (2L, (0 until 40).map(i => s"y$i").mkString(" "))))
    assert(b.isEmpty)
  }

  test("documents shorter than one gram emit nothing") {
    assert(dups(Seq((1L, "a b"), (2L, "a b"))).isEmpty)
  }
}
