package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen cross-probe index as an ARTIFACT
  * (SimilarityOps.lshIndexEntries +
  * SimilarityOps.nearDupPairsLshCrossIndexed — r12 verdict item 1): a
  * daily batch probes a persisted bucket-entry table, never the
  * existing corpus's raw embeddings. This spec pins (a) the indexed
  * probe returning exactly the inline probe's pairs, (b) the probe
  * PLAN touching only the materialized artifact — no scan of the
  * existing side's source anywhere in it, (c) the per-batch-vector
  * top-k cap bounding the output, and (d) the artifact schema check
  * failing by name.
  */
class LshCrossIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    SimilarityOps.withNorm(rows.toDF("vec_id", "embedding"))
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def vec(seed: Long, dim: Int): Array[Double] =
    (0 until dim).map(d =>
      (Math.floorMod(mix(seed * 4099L + d), 1000L).toDouble / 1000.0) - 0.5)
      .toArray

  private def randomRows(n: Int, dim: Int, idBase: Long): Seq[(Long, Array[Double])] =
    (0 until n).map(i => (idBase + i, vec(idBase + i, dim)))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the indexed probe returns exactly the inline probe's pairs") {
    val existing = emb(randomRows(300, 32, 0L))
    val batch = emb(Seq((1003L, vec(3L, 32)), (1007L, vec(7L, 32))) ++
      randomRows(80, 32, 2000L))
    val inline = pairSet(
      SimilarityOps.nearDupPairsLshCross(existing, batch, 0.3))
    val idx = SimilarityOps.lshIndexEntries(existing)
    val indexed = pairSet(
      SimilarityOps.nearDupPairsLshCrossIndexed(idx, batch, 0.3))
    assert(inline == indexed,
      s"only-inline=${inline -- indexed} only-indexed=${indexed -- inline}")
    assert(indexed.contains((3L, 1003L)) && indexed.contains((7L, 1007L)))
  }

  test("a batch probe touches ONLY the entries artifact — no existing-side scan in the plan") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-cross-index").toString
    val existingPath = s"$tmp/existing.parquet"
    emb(randomRows(200, 16, 0L)).write.mode("overwrite")
      .parquet(existingPath)
    // build the artifact FROM the persisted source, then materialize it
    // (the production shape: the index is written once and re-read; the
    // localCheckpoint stands in for the persisted-artifact read)
    val idx = SimilarityOps.lshIndexEntries(
      spark.read.parquet(existingPath)).localCheckpoint()
    val probe = SimilarityOps.nearDupPairsLshCrossIndexed(
      idx, emb(randomRows(40, 16, 5000L)), 0.3)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(!plan.contains(existingPath),
      s"the probe plan re-scans the existing corpus:\n$plan")
    probe.count() // and it executes against the artifact alone
    scala.reflect.io.Path(tmp).deleteRecursively()
  }

  test("the artifact round-trips through parquet: a re-read index probes identically") {
    // the production shape end to end: persist the index, read it back
    // in a fresh frame, probe — same pairs as probing the fresh build
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-cross-roundtrip").toString
    val existing = emb(randomRows(250, 16, 0L))
    val batch = emb(Seq((1005L, vec(5L, 16))) ++ randomRows(60, 16, 3000L))
    val idx = SimilarityOps.lshIndexEntries(existing)
    idx.write.mode("overwrite").parquet(s"$tmp/index.parquet")
    val reread = spark.read.parquet(s"$tmp/index.parquet")
    val fresh = pairSet(
      SimilarityOps.nearDupPairsLshCrossIndexed(idx, batch, 0.3))
    val persisted = pairSet(
      SimilarityOps.nearDupPairsLshCrossIndexed(reread, batch, 0.3))
    assert(fresh == persisted,
      s"only-fresh=${fresh -- persisted} only-persisted=${persisted -- fresh}")
    assert(persisted.contains((5L, 1005L)))
    scala.reflect.io.Path(tmp).deleteRecursively()
  }

  test("the artifact is self-describing: the batch signs at the index's frozen width") {
    // widths differ when the existing count differs; the SAME batch
    // probed against the SAME index must land in the same buckets no
    // matter who computes the width — bits rides the artifact
    val existing = emb(randomRows(300, 32, 0L))
    val idx = SimilarityOps.lshIndexEntries(existing)
    val bits = idx.select(max(col("bits"))).collect()(0).getInt(0)
    // 300 vectors / targetBucket 32 → ceil=10 buckets → 4-bit prefix
    assert(bits == 4, s"expected the adaptive 4-bit width, got $bits")
    assert(idx.select(min(length(col("sig")))).collect()(0).getInt(0) == bits,
      "every entry's signature must be exactly the frozen width")
  }

  test("topKPerBatchVector bounds the output to k rows per batch vector") {
    // one batch vector cloned against a dense existing clump: uncapped
    // emits every >=-threshold partner; capped keeps exactly k
    val base = vec(42L, 16)
    def jitter(i: Int): Array[Double] =
      base.zipWithIndex.map { case (v, d) => v + (if (d == i % 16) 1e-4 * (i + 1) else 0.0) }
    val existing = emb((0 until 20).map(i => (i.toLong, jitter(i))))
    val batch = emb(Seq((1000L, base)))
    val cross = SimilarityOps.nearDupPairsLshCross(existing, batch, 0.99)
    val uncapped = cross.count()
    assert(uncapped > 3, s"the clump must emit many pairs, got $uncapped")
    val capped = SimilarityOps.topKPerBatchVector(cross, 3)
    assert(capped.count() == 3)
    // the kept partners are the 3 strongest (cosine desc, id tiebreak)
    val expect = cross.orderBy(col("cos_sim").desc, col("existing_id"))
      .limit(3).collect().map(_.getLong(0)).toSet
    assert(pairSet(capped).map(_._1) == expect)
    intercept[IllegalArgumentException] {
      SimilarityOps.topKPerBatchVector(cross, 0)
    }
  }

  test("a frame that is not an index artifact fails BY NAME") {
    val notIdx = emb(randomRows(10, 8, 0L))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshCrossIndexed(
        notIdx, emb(randomRows(5, 8, 100L)), 0.5)
    }
    assert(e.getMessage.contains("lshIndexEntries"), e.getMessage)
  }

  test("an EMPTY index artifact fails BY NAME, not a silent 0-pair probe") {
    // a mis-pathed parquet read yields an empty frame with the right
    // schema; the probe must raise instead of signing the batch with a
    // null width and returning nothing (r13 advice)
    val existing = emb(randomRows(50, 16, 0L))
    val batch = emb(randomRows(5, 16, 100L))
    val emptyFat = SimilarityOps.lshIndexEntries(existing).limit(0)
    val eFat = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshCrossIndexed(emptyFat, batch, 0.5)
    }
    assert(eFat.getMessage.contains("EMPTY") &&
      eFat.getMessage.contains("lshIndexEntries"), eFat.getMessage)
    val emptySlim = SimilarityOps.lshIndexEntriesSlim(existing).limit(0)
    val eSlim = intercept[IllegalArgumentException] {
      SimilarityOps.nearDupPairsLshCrossSlim(emptySlim,
        SimilarityOps.lshIndexVectors(existing), batch, 0.5)
    }
    assert(eSlim.getMessage.contains("EMPTY"), eSlim.getMessage)
  }

  test("the SLIM artifact probe returns exactly the fat probe's pairs") {
    val existing = emb(randomRows(300, 32, 0L))
    val batch = emb(Seq((1003L, vec(3L, 32)), (1007L, vec(7L, 32))) ++
      randomRows(80, 32, 2000L))
    val fat = pairSet(SimilarityOps.nearDupPairsLshCrossIndexed(
      SimilarityOps.lshIndexEntries(existing), batch, 0.3))
    val slim = pairSet(SimilarityOps.nearDupPairsLshCrossSlim(
      SimilarityOps.lshIndexEntriesSlim(existing),
      SimilarityOps.lshIndexVectors(existing), batch, 0.3))
    assert(fat == slim,
      s"only-fat=${fat -- slim} only-slim=${slim -- fat}")
    assert(slim.contains((3L, 1003L)) && slim.contains((7L, 1007L)))
    // and the cos_sim VALUES match the fat form's rounded maxima
    val fatV = SimilarityOps.nearDupPairsLshCrossIndexed(
      SimilarityOps.lshIndexEntries(existing), batch, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    SimilarityOps.nearDupPairsLshCrossSlim(
      SimilarityOps.lshIndexEntriesSlim(existing),
      SimilarityOps.lshIndexVectors(existing), batch, 0.3)
      .collect().foreach(r =>
        assert(fatV((r.getLong(0), r.getLong(1))) == r.getDouble(2)))
  }

  test("the slim artifact stores each vector ONCE and probes from the persisted pair alone") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-cross-slim").toString
    val existingPath = s"$tmp/existing.parquet"
    emb(randomRows(200, 16, 0L)).write.mode("overwrite")
      .parquet(existingPath)
    val src = spark.read.parquet(existingPath)
    SimilarityOps.lshIndexEntriesSlim(src).write
      .mode("overwrite").parquet(s"$tmp/entries.parquet")
    SimilarityOps.lshIndexVectors(src).write
      .mode("overwrite").parquet(s"$tmp/vectors.parquet")
    val entries = spark.read.parquet(s"$tmp/entries.parquet")
    val vectors = spark.read.parquet(s"$tmp/vectors.parquet")
    // entries carry NO vector payload; vectors carry each vector once
    assert(entries.columns.toSet == Set("vec_id", "t", "sig", "pk", "bits"))
    assert(vectors.count() == 200,
      "the vector side table is single-copy: one row per existing vector")
    assert(entries.count() > vectors.count(),
      "entries fan out (1+probes)·tables per vector — the payload " +
        "they no longer carry is the artifact-bytes win")
    val probe = SimilarityOps.nearDupPairsLshCrossSlim(
      entries, vectors, emb(randomRows(40, 16, 5000L)), 0.3)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(!plan.contains(existingPath),
      s"the slim probe plan re-scans the existing corpus:\n$plan")
    // equivalence against the inline probe on the same inputs
    val inline = pairSet(SimilarityOps.nearDupPairsLshCross(
      src, emb(randomRows(40, 16, 5000L)), 0.3))
    assert(pairSet(probe) == inline)
    scala.reflect.io.Path(tmp).deleteRecursively()
  }
}
