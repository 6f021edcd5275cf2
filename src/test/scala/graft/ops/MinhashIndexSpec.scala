package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MinHash incremental-dedup index as persisted ARTIFACTS
  * (DedupOps.minhashIndex + incrementalStatusIndexed — the band-axis
  * twin of the r13 embedding index treatment): a daily batch probes
  * the existing corpus's hashes/bands/shingle-sets relations, never
  * its raw text. Pins (a) indexed ≡ inline status rows, (b) the probe
  * plan containing no reference to the existing documents' source,
  * (c) a parquet round-trip of all three artifact relations.
  */
class MinhashIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // vocabulary-translated variants so shingle sets overlap exactly as
  // constructed: same sentence, one token swapped → high Jaccard
  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private def existingRows: Seq[(Long, String)] =
    (0 until 40).map(i => (i.toLong * 2,
      if (i % 4 == 0) base else s"unrelated text number $i with tokens t$i u$i v$i w$i x$i y$i"))
  private def batchRows: Seq[(Long, String)] = Seq(
    (1001L, base),                                // exact dup of existing
    (1003L, base),                                // exact dup IN BATCH of 1001
    (1005L, base.replace("dog", "cat")),          // near dup of existing
    (1007L, "completely novel content qq rr ss tt uu vv ww xx yy zz"))

  test("the indexed probe returns exactly the inline probe's status rows") {
    val existing = docs(existingRows)
    val batch = docs(batchRows)
    val inline = DedupOps.incrementalStatus(existing, batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val indexed = DedupOps.incrementalStatusIndexed(
      DedupOps.minhashIndex(existing), batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(inline == indexed,
      s"only-inline=${inline -- indexed} only-indexed=${indexed -- inline}")
    val status = indexed.toMap
    assert(status(1001L) == "exact_dup_existing", status.toString)
    assert(status(1003L) == "exact_dup_in_batch", status.toString)
    assert(status(1005L) == "near_dup_existing", status.toString)
    assert(status(1007L) == "new", status.toString)
  }

  test("a batch probe touches ONLY the artifact relations — no existing-text scan in the plan") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-mh-index").toString
    val existingPath = s"$tmp/existing.parquet"
    docs(existingRows).write.mode("overwrite").parquet(existingPath)
    val built = DedupOps.minhashIndex(spark.read.parquet(existingPath))
    val idx = DedupOps.MinhashIndex(built.hashes.localCheckpoint(),
      built.bands.localCheckpoint(), built.sets.localCheckpoint())
    val probe = DedupOps.incrementalStatusIndexed(idx, docs(batchRows), 0.5)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(!plan.contains(existingPath),
      s"the probe plan re-scans the existing corpus:\n$plan")
    assert(probe.count() == batchRows.size)
    scala.reflect.io.Path(tmp).deleteRecursively()
  }

  test("the artifact round-trips through parquet: a re-read index probes identically") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-mh-roundtrip").toString
    val existing = docs(existingRows)
    val built = DedupOps.minhashIndex(existing)
    built.hashes.write.mode("overwrite").parquet(s"$tmp/hashes.parquet")
    built.bands.write.mode("overwrite").parquet(s"$tmp/bands.parquet")
    built.sets.write.mode("overwrite").parquet(s"$tmp/sets.parquet")
    val reread = DedupOps.MinhashIndex(
      spark.read.parquet(s"$tmp/hashes.parquet"),
      spark.read.parquet(s"$tmp/bands.parquet"),
      spark.read.parquet(s"$tmp/sets.parquet"))
    val fresh = DedupOps.incrementalStatusIndexed(built, docs(batchRows), 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val persisted = DedupOps.incrementalStatusIndexed(reread, docs(batchRows), 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fresh == persisted,
      s"only-fresh=${fresh -- persisted} only-persisted=${persisted -- fresh}")
    scala.reflect.io.Path(tmp).deleteRecursively()
  }
}
