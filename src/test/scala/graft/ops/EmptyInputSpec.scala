package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Degenerate-input robustness: zero-row tables, empty strings, and
  * single-token documents must produce empty/benign results — never a
  * thrown job. This is the failure class behind Spark's descending
  * `sequence(0, -1)` ("Illegal sequence boundaries") and friends: at
  * 100 TB some partition WILL be empty and some document WILL be
  * zero-length, and one bad row kills the whole job.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val noDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  lazy val degenerateDocs: DataFrame =
    Seq((1L, ""), (2L, "one"), (3L, "two toks")).toDF("doc_id", "text")

  test("dedup family survives zero-row and degenerate documents") {
    assert(DedupOps.exactGroups(noDocs).count() == 0)
    assert(DedupOps.simhash(noDocs).count() == 0)
    assert(DedupOps.shingledAll(noDocs).count() == 0)
    // shorter-than-k docs shingle to nothing, not to an error
    assert(DedupOps.shingledAll(degenerateDocs).count() == 0)
    assert(DedupOps.simhash(degenerateDocs).count() == 3)
    assert(DedupOps.simhashPairs(DedupOps.simhash(noDocs)).count() == 0)
    assert(DedupOps.lshBuckets(DedupOps.lshBands(
      DedupOps.minhashSignature(DedupOps.shingledAll(noDocs)))).count() == 0)
    assert(DedupOps.substringSpans(noDocs).count() == 0)
    assert(DedupOps.substringSpans(degenerateDocs).count() == 0)
    // clean keeps the doc spine even when nothing was marked
    assert(DedupOps.substringClean(noDocs).count() == 0)
    assert(DedupOps.substringClean(degenerateDocs).count() == 3)
  }

  test("text ops survive empty strings and empty tables") {
    val out = degenerateDocs.select(
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.fingerprint(TextOps.tokens(col("text"))).as("fp"),
      TextOps.piiScrub(col("text")).as("scrub"),
      TextOps.canonicalize(col("text")).as("canon"))
    assert(out.count() == 3)
    assert(noDocs.select(TextOps.langId(TextOps.tokens(col("text")))).count() == 0)
  }

  test("multimodal plumbing survives empty payloads and empty tables") {
    val media = MultimodalOps.packDocuments(
      degenerateDocs.withColumn("n_chars", length(col("text")).cast("long")))
    // doc 1 has a zero-byte payload: frameOffsets must yield [] not throw
    val frames = media.select(col("media_id"),
      explode(MultimodalOps.frameOffsets(length(col("payload")).cast("long"), 256)))
    assert(frames.count() == 2) // docs 2 and 3 only
    assert(MultimodalOps.resizeStub(media).count() == 3)
    val emptyMedia = MultimodalOps.packDocuments(
      noDocs.withColumn("n_chars", lit(0L)))
    assert(MultimodalOps.decodeStub(emptyMedia).count() == 0)
  }

  test("joins and sessions survive empty sides") {
    val noEvents = Seq.empty[(Long, Long, Long)].toDF("user_id", "ts_us", "event_id")
    assert(SessionOps.sessionStats(noEvents).count() == 0)
    val left = Seq((1L, 100L)).toDF("key", "ts_us")
    val noRight = Seq.empty[(Long, Long, Long)].toDF("key", "rts", "v")
    val out = JoinOps.asofJoinPrior(left, noRight, "key", "ts_us", "rts", Seq("v"))
      .select("asof_ts").as[Option[Long]].collect()
    assert(out.toSeq == Seq(None)) // left preserved, no match
    val next = JoinOps.asofJoinNext(left, noRight, "key", "ts_us", "rts", Seq("v"))
      .select("asof_ts").as[Option[Long]].collect()
    assert(next.toSeq == Seq(None))
  }

  test("sampling survives empty tables") {
    assert(SampleOps.hashSample(noDocs, "doc_id", 0.5).count() == 0)
  }

  test("multi-probe ANN survives empty corpora, queries, and centroid sets") {
    val noVecs = SimilarityOps.withNorm(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    val someVecs = SimilarityOps.withNorm(
      Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding"))
    // LSH multi-probe: empty either side → empty result, no error
    assert(SimilarityOps.lshTopKMultiProbe(noVecs, someVecs, 3, 4).count() == 0)
    assert(SimilarityOps.lshTopKMultiProbe(someVecs, noVecs, 3, 4).count() == 0)
    // k-means over an empty corpus trains nothing; assignment is empty
    assert(SimilarityOps.kmeansCentroids(noVecs, 4, 2).isEmpty)
    assert(SimilarityOps.kmeansCells(noVecs, 4, 2).count() == 0)
    // IVF probe with a trained matrix over empty queries → empty
    val cents = SimilarityOps.kmeansCentroids(someVecs, 2, 1)
    assert(SimilarityOps.ivfTopKMultiProbe(someVecs, noVecs, cents, 3, 2).count() == 0)
  }

  test("round-2 ops survive empty tables") {
    val noKv = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "v")
    // quantile sketch over zero rows yields zero boundaries → one bin
    assert(PrefixOps.globalCumsum(noKv, "ts", Seq("k"), "v", "cum").count() == 0)
    assert(IntervalOps.mergeIntervals(
      noKv.toDF("user_id", "iv_start", "iv_end").withColumn("event_id", lit(1L)),
      "user_id", "iv_start", "iv_end", "event_id").count() == 0)
    assert(ChangeOps.latestSnapshot(noKv, Seq("k"), Seq("ts"), Seq("v")).count() == 0)
    assert(ChangeOps.scd2(noKv, Seq("k"), "ts", "v").count() == 0)
    assert(TimeSeriesOps.gapFillCounts(noKv, "k", "ts", 10L).count() == 0)
    // empty bucketed as-of: left preserved unmatched, empty-left → empty
    val left = Seq((1L, 100L)).toDF("key", "ts_us")
    val noRight = Seq.empty[(Long, Long, Long)].toDF("key", "rts", "v")
    val b = JoinOps.asofJoinPriorBucketed(left, noRight, "key", "ts_us", "rts", Seq("v"), 100L)
      .select("asof_ts").as[Option[Long]].collect()
    assert(b.toSeq == Seq(None))
    // mixing: the one-row total over zero strata is null/0 — filters to empty
    assert(MixOps.equalTokenDownsample(
      noKv.toDF("doc_id", "lang", "tok"), "doc_id", "lang", "tok").count() == 0)
    // profiling emits a row per column even over zero rows (all-null stats)
    val prof = ProfileOps.profile(noDocs, Seq("doc_id", "text")).collect()
    assert(prof.length == 2 && prof.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0))

    // k-means over an empty corpus: empty assignment, not an analysis
    // error from a zero-candidate argmin array
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(SimilarityOps.kmeansCells(noVecs, k = 4, iters = 2).count() == 0)
    // jaccard set path over empty pairs: everything collapses to empty
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val sets = DedupOps.candidateShingleSets(noPairs, noDocs)
    assert(sets.count() == 0)
    assert(DedupOps.ngramJaccardSets(noPairs, sets).count() == 0)
  }

  test("round-7 operators survive zero-row inputs") {
    val noDocs2 = noDocs
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
    // k-center: empty centers from an empty corpus, empty assignment
    assert(SimilarityOps.kcenterCenters(noVecs, 3).isEmpty)
    // random projection over zero rows: zero exploded rows
    val w = SimilarityOps.rpWeights(2, 4)
    assert(SimilarityOps.randomProjectLong(noVecs, w).count() == 0)
    // leakage audit over an empty verified-pair list
    assert(DedupOps.splitLeakage(noPairs, 0.3).count() == 0)
    // containment over empty pairs/sets
    assert(DedupOps.ngramContainmentSets(
      noPairs.select(col("doc_a"), col("doc_b")),
      DedupOps.candidateShingleSets(
        noPairs.select(col("doc_a"), col("doc_b")), noDocs2)).count() == 0)
    // BPE: no words → no merges; segmentation of nothing is nothing
    assert(TokenizerOps.bpeMerges(noDocs2, 3).isEmpty)
    assert(TokenizerOps.segmentStats(noDocs2, Seq.empty).count() == 0)
    // pagerank over an empty edge list: empty ranks, no division error
    assert(GraphOps.pagerank(noPairs.select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b").count() == 0)
    // metric frame over empty ranked lists
    val noRanked = Seq.empty[(Long, Long, Long)]
      .toDF("query_id", "neighbor_id", "rank")
    assert(RetrievalOps.rankingMetrics(noRanked, noRanked).count() == 0)
  }

  test("round-9 operators survive zero-row and degenerate inputs") {
    val noNum = Seq.empty[(Double, Double)].toDF("x", "y")
    val noCat = Seq.empty[(String, String)].toDF("u", "v")
    // one-row aggregates over nothing: a single null/zero row, no throw
    assert(StatsOps.spearman(noNum, "x", "y").count() == 1)
    assert(StatsOps.chiSquareCells(noCat, "u", "v").count() == 0)
    assert(StatsOps.cramersV(noCat, "u", "v").count() == 1)
    assert(StatsOps.mutualInfoCells(noCat, "u", "v").count() == 0)
    assert(StatsOps.mannWhitney(
      Seq.empty[(String, Long)].toDF("s", "v"), "s", "a", "b", "v")
      .count() == 1)
    assert(StatsOps.kendallTauB(noNum, "x", "y").count() == 1)
    assert(StatsOps.giniCard(
      Seq.empty[(String, String, Long)].toDF("g", "i", "c"), "g", "i", "c")
      .count() == 0)
    val noKv = Seq.empty[(String, Double)].toDF("k", "v")
    assert(StatsOps.robustZscore(noKv, "k", "v").count() == 0)
    assert(StatsOps.trimmedMean(noKv, "k", "v").count() == 0)
    // single observation: its own median, MAD 0, no outliers, no trim
    val one = Seq(("t", 3.0)).toDF("k", "v")
    val rz = StatsOps.robustZscore(one, "k", "v").collect().head
    assert(rz.getAs[Long]("mad_micro") == 0L && rz.getAs[Long]("n_outliers") == 0L)
    assert(StatsOps.trimmedMean(one, "k", "v").collect().head
      .getAs[Long]("trimmed_mean_micro") == 3000000L)
    // series ops: empty events → empty output; single point drops from
    // theil-sen (no pairs) but sax still emits its word
    val noEv = Seq.empty[(Long, Long, Long, Double)].toDF("k", "t", "tie", "v")
    val oneEv = Seq((1L, 10L, 0L, 5.0)).toDF("k", "t", "tie", "v")
    assert(TimeSeriesOps.theilSen(noEv, "k", "t", "v").count() == 0)
    assert(TimeSeriesOps.theilSen(oneEv, "k", "t", "v").count() == 0)
    assert(TimeSeriesOps.sax(noEv, "k", "t", "tie", "v").count() == 0)
    assert(TimeSeriesOps.sax(oneEv, "k", "t", "tie", "v")
      .collect().head.getAs[String]("sax_word") == "c")
    // rouge over empty/degenerate docs: no pairs / zero-score pairs
    val noToks = noDocs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    val degToks = degenerateDocs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    assert(TextOps.rougeAdjacent(noToks).count() == 0)
    assert(TextOps.rougeAdjacent(degToks).count() == 2)
    assert(TextOps.rougeL(noToks).count() == 0)
    assert(TextOps.rougeL(degToks).count() == 2)
    // reservoir and proximity over empty tables
    assert(SampleOps.weightedReservoir(
      Seq.empty[(Long, String, Double)].toDF("id", "src", "w"),
      "id", "src", col("w"), 3).count() == 0)
    assert(RetrievalOps.proximityPair(noDocs, "a", "b", 5).count() == 0)
    // knn cap over an empty pair list
    assert(GraphOps.knnGraph(
      Seq.empty[(Long, Long, Double)].toDF("a", "b", "s"),
      "a", "b", "s", 3).count() == 0)
  }

  test("round-10 operators survive zero-row and degenerate inputs") {
    val noEmb = SimilarityOps.withNorm(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    // LSH near-dup pairs: empty corpus -> empty pairs, no bin() crash
    // on the 1-row count of zero
    assert(SimilarityOps.nearDupPairsLsh(noEmb, 0.5).count() == 0)
    // PPR over an empty edge list: empty vector, not a 0/0 teleport
    assert(GraphOps.personalizedPagerank(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b",
      Seq(Tuple1(1L)).toDF("node")).count() == 0)
    // QL retrieval: no candidate docs -> empty ranking
    assert(RetrievalOps.qlDirichletTopK(noDocs, Seq("x"), 5).count() == 0)
    assert(RetrievalOps.qlDirichletTopK(degenerateDocs, Seq("zzz"), 5)
      .count() == 0)
    // Heaps law: empty corpus -> the single summary row with 0 points
    val h = ProfileOps.heapsLaw(noDocs).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L)
    // DP counts / quantile norm / Simpson over empty tables
    assert(ProfileOps.dpCounts(
      Seq.empty[(String, String)].toDF("lang", "source"),
      Seq("lang", "source")).count() == 0)
    assert(MixOps.quantileNormalize(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars"),
      "source", "n_chars", "doc_id").count() == 0)
    assert(StatsOps.simpsonCard(
      Seq.empty[(Long, String, String, Long)].toDF("id", "lang", "source", "v"),
      "lang", "source", "A", "B", "v").count() == 1) // the pooled row
    // BLEU over empty/degenerate docs
    val noToks = noDocs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    val degToks = degenerateDocs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    assert(TextOps.bleuAdjacent(noToks).count() == 0)
    assert(TextOps.bleuAdjacent(degToks).count() == 2)
    // EM linkage: no candidate pairs -> an empty frame, not a NaN EM
    val emptyEm = DedupOps.linkageWeightsEm(noDocs
      .withColumn("lang", lit("x")).withColumn("source", lit("y"))
      .withColumn("n_chars", lit(1L)),
      Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column)](
        "lang" -> ((a, b) => a.getField("lang") === b.getField("lang"))),
      offset = 1L, iters = 3)
    assert(emptyEm.count() == 0)
  }

  test("round-11 operators survive zero-row inputs") {
    val noEmb = SimilarityOps.withNorm(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    // the min_t-tagged generator and the top-k cap over empty inputs
    assert(SimilarityOps.nearDupPairsLshByTable(
      SimilarityOps.lshAutoSignatureStage(noEmb), 0.5).count() == 0)
    assert(SimilarityOps.topKPerVector(
      Seq.empty[(Long, Long, Double)].toDF("vec_a", "vec_b", "cos_sim"),
      3).count() == 0)
    // probes = 0 degenerates to the home-bucket-only generator
    assert(SimilarityOps.nearDupPairsLsh(noEmb, 0.5, probes = 0).count() == 0)
  }
}
