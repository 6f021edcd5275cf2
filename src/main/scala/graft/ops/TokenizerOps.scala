package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer-merge training (Sennrich, Haddow, Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer is itself a trained artifact of the corpus, and a
  * training-data engine should be able to produce it.
  *
  * The classic algorithm, re-expressed for Spark's execution model:
  *
  *  1. VOCAB — one corpus pass folds the token stream to the distinct
  *     (word, count) table. At 100 TB this is the only corpus-sized
  *     step, and it is a plain map-side-combined aggregation; every
  *     merge iteration below runs over the VOCAB (Heaps'-law small),
  *     never the corpus again.
  *  2. SEQ — each word becomes its space-joined character sequence
  *     (regexp_replace, scan-side).
  *  3. MERGE ×T — per iteration: adjacent-pair counts weighted by word
  *     count (one vocab-sized aggregation), argmax via
  *     TakeOrderedAndProject to exactly ONE collected row (count DESC,
  *     pair ASC — the deterministic tie rule), then `replace(seq, pair,
  *     merged)` rewrites the sequences. The merge chain is inherently
  *     sequential (merge i's counts depend on merge i−1's rewrite — the
  *     same driver-iterated contract as Lloyd's k-means), so T bounded
  *     driver actions is the correct shape, not a limitation.
  *
  * Determinism: counts are exact longs; `replace` is leftmost
  * non-overlapping all-occurrences in both Spark and DuckDB, so the
  * whole chain — including which pair wins each round — replays
  * bit-for-bit in the oracle's unrolled CTEs.
  */
object TokenizerOps {

  /** The distinct-word vocabulary with counts and char-spaced form. */
  def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .select(
        rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"),
        col("cnt"))

  /** The first `t` learned merges, in learning order:
    * (merge_rank, pair, merged, pair_count). Training runs here (t
    * bounded driver actions over the vocab); share the result through
    * [[ModelCache]] when several queries need it.
    */
  def bpeMerges(docs: DataFrame, t: Int,
      checkpointEvery: Int = 16): Seq[(Long, String, String, Long)] =
    bpeMergesTracked(docs, t, checkpointEvery)._1

  /** [[bpeMerges]] plus the max analyzed-plan node count seen across
    * iterations — the observable the lineage-bound spec pins. Node count
    * stays O(checkpointEvery), not O(t), because each checkpoint
    * collapses the rewrite chain to a LogicalRDD leaf.
    */
  private[graft] def bpeMergesTracked(docs: DataFrame, t: Int,
      checkpointEvery: Int): (Seq[(Long, String, String, Long)], Int) = {
    require(t >= 1, s"t must be >= 1, got $t")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    var seqs = vocab(docs)
    var maxPlanNodes = 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (i <- 1 to t) {
      val top = seqs
        .select(explode(TextOps.shingles(split(col("seq"), " "), 2)).as("pair"),
          col("cnt"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) return (merges.toSeq, maxPlanNodes) // vocab exhausted: done
      val pair = top(0).getString(0)
      val cnt = top(0).getLong(1)
      val merged = pair.replace(" ", "")
      merges += ((i.toLong, pair, merged, cnt))
      // call_function keeps the learned pair a bound literal — no SQL
      // string-literal escaping concerns for backslashes/quotes in pairs.
      seqs = seqs.select(
        call_function("replace", col("seq"), lit(pair), lit(merged)).as("seq"),
        col("cnt"))
      // The rewrite chain grows plan lineage linearly in T; at production
      // merge counts (32k) an unbounded chain blows up analysis time.
      // Materialize every `checkpointEvery` merges so the plan seen by
      // iteration i is O(checkpointEvery) deep regardless of T.
      if (i % checkpointEvery == 0 && i < t) seqs = seqs.localCheckpoint(true)
      maxPlanNodes = math.max(maxPlanNodes,
        seqs.queryExecution.analyzed.collect { case n => n }.size)
    }
    (merges.toSeq, maxPlanNodes)
  }

  /** Apply a learned merge list: per document, the word count and the
    * subword count after segmenting every word with the merges in
    * learning order — the compression measurement that tells you what
    * the tokenizer actually buys on this corpus (subwords/word → 1 as
    * merges cover it). FULLY scan-side: the merge chain is a nested
    * literal replace() expression inside a `transform` over the doc's
    * own token array, aggregated per row — zero shuffles, zero joins;
    * the trained merges travel as expression literals exactly like
    * k-means centroids do.
    */
  def segmentStats(docs: DataFrame,
      merges: Seq[(Long, String, String, Long)]): DataFrame = {
    def applyMerges(seq: org.apache.spark.sql.Column) =
      merges.foldLeft(seq) { case (c, (_, pair, merged, _)) =>
        call_function("replace", c, lit(pair), lit(merged))
      }
    val toks = TextOps.tokens(col("text"))
    val words = filter(toks, w => length(w) > 0)
    docs.select(
      col("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(
        transform(words, w =>
          size(split(applyMerges(rtrim(regexp_replace(w, "(.)", "$1 "))), " "))
            .cast("long")),
        lit(0L),
        (acc, x) => acc + x).as("n_subwords"))
  }

  /** Tokenizer FERTILITY per corpus slice (subwords emitted per word —
    * the standard measure of how well a trained tokenizer fits a
    * domain; Ács 2019 popularized it for multilingual vocab audits):
    * the [[segmentStats]] segmentation rolled up by `keyCol` instead of
    * per doc. A source whose fertility sits far above the corpus mean
    * is under-served by the merge table — the data card that tells you
    * to retrain or re-balance BEFORE a tokenizer ships.
    *
    * Same zero-shuffle scan shape as segmentStats plus one bounded
    * (|sources|-row) aggregation; the ratio lands as an integer-floored
    * micro unit (`floor(n_subwords·1e6 / n_words)` — exact-integer
    * numerator, so the floor never straddles an engine ulp).
    */
  def fertilityBySource(docs: DataFrame,
      merges: Seq[(Long, String, String, Long)],
      keyCol: String = "source"): DataFrame = {
    def applyMerges(seq: org.apache.spark.sql.Column) =
      merges.foldLeft(seq) { case (c, (_, pair, merged, _)) =>
        call_function("replace", c, lit(pair), lit(merged))
      }
    val words = filter(TextOps.tokens(col("text")), w => length(w) > 0)
    docs.select(
      col(keyCol).as("source"),
      size(words).cast("long").as("nw"),
      aggregate(
        transform(words, w =>
          size(split(applyMerges(rtrim(regexp_replace(w, "(.)", "$1 "))), " "))
            .cast("long")),
        lit(0L),
        (acc, x) => acc + x).as("ns"))
      .groupBy("source")
      .agg(sum("nw").as("n_words"), sum("ns").as("n_subwords"))
      .select(col("source"), col("n_words"), col("n_subwords"),
        floor(col("n_subwords").cast("double") * lit(1000000.0) /
          col("n_words").cast("double")).cast("long").as("fertility_micro"))
  }

  /** Skip-gram training pairs with deterministic negative sampling
    * (Mikolov et al. 2013) — the contrastive data-prep behind word2vec
    * and its descendants: every (center, context) pair within a ±window
    * plus `negatives` hash-drawn corrupted contexts per pair. Pure
    * scan-side row algebra: positions explode in-row (flatten/
    * transform over the bounded token array), negatives draw from the
    * doc's own vocabulary by the md5 uniform (deterministic on any
    * partitioning — the SampleOps.hashDraw contract), so the whole
    * generated dataset replays in an oracle. Zero shuffles; at 100 TB
    * generation is a map over the corpus scan.
    */
  def skipgramPairs(docs: DataFrame, window: Int = 2,
      negatives: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val n = size(col("toks"))
    // (ci, xi) offset pairs: xi in [ci−window, ci+window] \ {ci},
    // clipped to the doc; docs under 2 tokens yield nothing (and the
    // n<2 branch never builds a descending sequence)
    val offsetPairs = when(n >= 2,
      flatten(transform(sequence(lit(1), greatest(n, lit(2))), i =>
        transform(
          org.apache.spark.sql.functions.filter(
            sequence(greatest(i - window, lit(1)),
              least(i + window, greatest(n, lit(2)))),
            j => j =!= i),
          j => struct(i.cast("int").as("ci"), j.cast("int").as("xi"))))))
      .otherwise(array().cast("array<struct<ci:int,xi:int>>"))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), explode(offsetPairs).as("p"))
      .select(col("doc_id"),
        element_at(col("toks"), col("p.ci")).as("center"),
        element_at(col("toks"), col("p.xi")).as("context"),
        col("p.ci").cast("long").as("pos"),
        col("p.xi").cast("long").as("ctx_pos"),
        (if (negatives == 0)
          // sequence(0, -1) would be the DESCENDING [0, -1] in Spark —
          // two bogus draws, not zero. Emit the empty array explicitly.
          array().cast("array<string>")
        else
          transform(sequence(lit(0), lit(negatives - 1)), g =>
            element_at(col("toks"),
              (SampleOps.hashDraw(concat_ws(":", col("doc_id"),
                col("p.ci").cast("long"), col("p.xi").cast("long"),
                g.cast("long"))) % size(col("toks")) + 1).cast("int"))))
          .as("neg_samples"))
  }

  /** Pointwise-mutual-information collocations over adjacent-token
    * bigrams (Church & Hanks, "Word Association Norms, Mutual
    * Information, and Lexicography", Computational Linguistics 1990) —
    * the collocation detector that feeds phrase-vocabulary induction
    * (word2vec's phrase pass) and multiword-expression mining:
    *
    *   pmi(l, r) = ln( p(l,r) / (p(l,·) · p(·,r)) )
    *
    * with all three probabilities estimated from the BIGRAM table
    * itself (left marginal, right marginal, grand total), so one
    * corpus-sized aggregation feeds everything. Scale shape: bigrams
    * explode scan-side (zip_with over the row's own token array — no
    * joins), ONE shuffle builds the (l, r, n) table; both marginals
    * and the total derive from that table (vocab-bounded, ≪ corpus)
    * and ride back as broadcasts. The corpus is touched exactly once.
    *
    * Determinism: counts are exact longs; the PMI ratio multiplies/
    * divides doubles that are exactly-represented integers (IEEE-
    * deterministic), and ln + round(·,6) is the text_lm_score parity
    * contract. `minCount` prunes the noisy low-count tail (PMI's known
    * bias toward hapax pairs) BEFORE the join, so the broadcast side
    * of nothing depends on it.
    */
  def bigramPmi(docs: DataFrame, minCount: Long): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val pairs = docs
      .select(explode(
        zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("tok_l"), col("p.r").as("tok_r"))
    // the pair-count table is the trained artifact every downstream
    // branch (marginals, total, output) reads — cache IT so the corpus
    // explode+shuffle runs once, not once per branch (4 planned corpus
    // scans otherwise; static exchange reuse does not collapse them)
    val pc = pairs.groupBy("tok_l", "tok_r").agg(count(lit(1)).as("n_pair"))
      .cache()
    val lm = pc.groupBy("tok_l").agg(sum("n_pair").as("n_left"))
    val rm = pc.groupBy("tok_r").agg(sum("n_pair").as("n_right"))
    val tot = pc.agg(sum("n_pair").as("n_total"))
    pc.filter(col("n_pair") >= minCount)
      .join(broadcast(lm), Seq("tok_l"))
      .join(broadcast(rm), Seq("tok_r"))
      .crossJoin(broadcast(tot))
      .select(col("tok_l"), col("tok_r"), col("n_pair"),
        round(log(
          (col("n_pair").cast("double") * col("n_total").cast("double")) /
            (col("n_left").cast("double") * col("n_right").cast("double"))), 6)
          .as("pmi"))
  }

  // ---------------------------------------------------------------------
  // Unigram-LM tokenizer (Kudo, "Subword Regularization", ACL 2018; the
  // SentencePiece `--model_type=unigram` trainer) — the third production
  // tokenizer family beside BPE train/segment and WordPiece inference.
  //
  // Deterministic hard-EM (Viterbi) variant, re-expressed for Spark:
  //
  //  1. SEED — all substrings (length ≤ maxPieceLen) of the distinct-word
  //     table, weighted by word count: every single character is kept
  //     (coverage guarantee — Viterbi can always segment), plus the top
  //     `seedK` multi-char candidates by (count DESC, piece ASC).
  //  2. SCORE — piece log-probabilities as INTEGER micro units:
  //     floor(ln((cnt+1)/(tot+|V|))·1e6). Laplace smoothing keeps every
  //     kept piece finite; floor (not round) because Java's round is
  //     half-up while DuckDB's is half-away-from-zero — floor is the
  //     same function in both engines, so the trained scores replay.
  //  3. E-STEP — per DISTINCT word (Heaps'-law small; the corpus is
  //     never re-touched), the Viterbi best segmentation under the
  //     current scores: an in-row DP over word positions where each
  //     cell is argmax over piece lengths, ties broken by the
  //     lexicographic max of struct(score, len) — i.e. longest piece on
  //     equal score — which is exactly `max(struct_pack(s, l))` in
  //     DuckDB, so the argmax itself is replayable. Piece usage counts
  //     roll up weighted by word count (one vocab-sized aggregation).
  //  4. M-STEP + PRUNE — usage counts become the next scores; the vocab
  //     keeps all single chars plus the top `finalK` multi-char pieces
  //     by (count DESC, piece ASC). `rounds` EM rounds, driver-iterated
  //     like [[bpeMerges]] (the merge chain there, the EM chain here,
  //     are inherently sequential).
  //
  // Only the PIECE vocab (bounded by seedK + alphabet — a model
  // artifact, like k-means centroids) is ever collected; the word table
  // stays distributed. Integer DP scores make every comparison exact,
  // so the whole chain — including which piece wins each lattice cell —
  // replays in the oracle's unrolled CTEs.
  // ---------------------------------------------------------------------

  /** Viterbi DP forward pass, fully in-row: returns the dp array where
    * index k+1 holds struct(s = best integer score covering the first k
    * chars, l = the winning piece length at k). `vmap` is the literal
    * piece→score map. Words longer than `mw` are the caller's problem
    * (they are filtered to the char-fallback path).
    */
  private[graft] def viterbiDp(w: org.apache.spark.sql.Column,
      vmap: org.apache.spark.sql.Column, p: Int, mw: Int)
      : org.apache.spark.sql.Column = {
    val sentinel = Long.MinValue / 4
    val init = array(struct(lit(0L).as("s"), lit(0).as("l")))
    aggregate(sequence(lit(1), lit(mw)), init, (acc, i) => {
      val cands = transform(sequence(lit(1), lit(p)), l => {
        val start = i - l + lit(1) // piece start; dp[i-l] sits at acc[start]
        val piece = call_function("substring", w, greatest(start, lit(1)), l)
        val sc = try_element_at(vmap, piece)
        val prev = coalesce(
          try_element_at(acc, greatest(start, lit(1))).getField("s"),
          lit(sentinel))
        when(l <= i && sc.isNotNull,
          struct((prev + sc).as("s"), l.cast("int").as("l")))
          .otherwise(struct(lit(sentinel).as("s"), lit(0).as("l")))
      })
      when(i <= length(w), concat(acc, array(array_max(cands)))).otherwise(acc)
    })
  }

  /** Backward walk over a [[viterbiDp]] array: the best segmentation's
    * pieces in order. Terminates in ≤ mw steps because every dp entry's
    * l ≥ 1 (single-char coverage).
    */
  private[graft] def viterbiPieces(w: org.apache.spark.sql.Column,
      dparr: org.apache.spark.sql.Column, mw: Int)
      : org.apache.spark.sql.Column = {
    val init = struct(length(w).cast("int").as("pos"),
      array().cast("array<string>").as("pieces"))
    val fin = aggregate(sequence(lit(1), lit(mw)), init, (acc, _) => {
      val pos = acc.getField("pos")
      val l = coalesce(
        try_element_at(dparr, greatest(pos + 1, lit(1))).getField("l"), lit(1))
      when(pos > 0,
        struct((pos - l).cast("int").as("pos"),
          concat(
            array(call_function("substring", w,
              greatest(pos - l + lit(1), lit(1)), l)),
            acc.getField("pieces")).as("pieces")))
        .otherwise(acc)
    })
    fin.getField("pieces")
  }

  /** Distinct words with counts; the only corpus-sized step. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** (piece, cnt) → (piece, cnt, scoreMicro) with the Laplace-smoothed
    * floor-micro log-probability. Order-independent (sum over longs).
    */
  private def scoreVocab(v: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val tot = v.map(_._2).sum
    val n = v.size
    v.map { case (pc, c) =>
      (pc, c,
        math.floor(math.log((c + 1).toDouble / (tot.toDouble + n.toDouble))
          * 1e6).toLong)
    }
  }

  /** Train the unigram-LM vocab: returns (piece, cnt, score_micro)
    * sorted by piece. `cnt` is the final round's E-step usage count
    * (seed substring-occurrence count if rounds == 0).
    */
  def unigramTrain(docs: DataFrame, maxPieceLen: Int, seedK: Int,
      finalK: Int, rounds: Int, maxWordLen: Int): Seq[(String, Long, Long)] = {
    require(maxPieceLen >= 1 && seedK >= 0 && finalK >= 0 && rounds >= 0)
    val uw = wordTable(docs)
    val trainW = uw.filter(length(col("word")) <= maxWordLen)

    // SEED: substring candidates from ALL distinct words (so the single-
    // char alphabet covers even char-fallback words), in-row explode.
    val subPieces = flatten(transform(sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + 1)),
        l => call_function("substring", col("word"), i, l))))
    val cand = uw
      .select(explode(subPieces).as("piece"), col("cnt"))
      .groupBy("piece")
      .agg(sum("cnt").as("c"))
    val singles = cand.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val multi = cand.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc)
      .limit(seedK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var vocab = scoreVocab(singles ++ multi)

    for (_ <- 1 to rounds) {
      val vmap = typedlit(vocab.map(t => t._1 -> t._3).toMap)
      val ecnt = trainW
        .select(col("word"), col("cnt"),
          viterbiDp(col("word"), vmap, maxPieceLen, maxWordLen).as("dp"))
        .select(col("cnt"),
          explode(viterbiPieces(col("word"), col("dp"), maxWordLen))
            .as("piece"))
        .groupBy("piece")
        .agg(sum("cnt").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val withCnt = vocab.map { case (pc, _, _) => (pc, ecnt.getOrElse(pc, 0L)) }
      val keep = withCnt.filter(_._1.length == 1) ++
        withCnt.filter(_._1.length > 1)
          .sortBy { case (pc, c) => (-c, pc) }.take(finalK)
      vocab = scoreVocab(keep)
    }
    vocab.sortBy(_._1)
  }

  /** The trained vocab as the oracle-checked DataFrame artifact. */
  def unigramVocabTable(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[(String, Long, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("score_micro", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vocab.map { case (p, c, s) => Row(p, c, s) }, 1),
      schema)
  }

  /** Per-doc segmentation stats under a trained unigram vocab:
    * (doc_id, n_words, n_pieces, nll_micro) where nll_micro is the
    * summed negative best-path score (integer micro units — exact).
    * Same scale shape as [[wordpieceStats]]: the DP evaluates once per
    * DISTINCT word, broadcasts back onto the token stream, one shuffle.
    * Words over `maxWordLen` fall back to the always-covered char
    * segmentation (the SentencePiece overlong-sentence rule).
    */
  def unigramSegmentStats(docs: DataFrame, vocab: Seq[(String, Long, Long)],
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    require(vocab.nonEmpty, "unigramSegmentStats needs a trained vocab")
    val vmap = typedlit(vocab.map(t => t._1 -> t._3).toMap)
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val uws = tok.select("w").distinct()
    val short = uws.filter(length(col("w")) <= maxWordLen)
      .select(col("w"),
        viterbiDp(col("w"), vmap, maxPieceLen, maxWordLen).as("dp"))
      .select(col("w"),
        size(viterbiPieces(col("w"), col("dp"), maxWordLen)).cast("long")
          .as("np"),
        (lit(-1L) * try_element_at(col("dp"), length(col("w")) + 1)
          .getField("s")).as("nll"))
    val overlong = uws.filter(length(col("w")) > maxWordLen)
      .select(col("w"), length(col("w")).cast("long").as("np"),
        aggregate(sequence(lit(1), length(col("w"))), lit(0L), (acc, i) =>
          acc - try_element_at(vmap,
            call_function("substring", col("w"), i, lit(1)))).as("nll"))
    tok.join(broadcast(short.unionAll(overlong)), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("np")).as("n_pieces"),
        sum(col("nll")).as("nll_micro"))
  }

  /** A learned merge list as a DataFrame (the oracle-checked artifact). */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(Long, String, String, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", LongType, nullable = false),
      StructField("pair", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map { case (r, p, m, c) => Row(r, p, m, c) }, 1),
      schema)
  }

  /** WordPiece greedy longest-match-first segmentation (Wu et al.,
    * "Google's Neural Machine Translation System", 2016; the BERT
    * inference tokenizer) against a FIXED vocab: from each position
    * take the LONGEST matching piece (continuation pieces carry the
    * `##` prefix); if no piece matches — or the word exceeds
    * `maxWordLen`, the HF max_input_chars_per_word rule — the whole
    * word becomes one [UNK]. The complement of [[segmentStats]]'s BPE
    * merge-replay: same corpus measurement (pieces per word), different
    * algorithm family (longest-match vs merge-order).
    *
    * Shape at scale: the segmentation loop (a bounded `aggregate` over
    * `maxWordLen` steps, each step an `array_max` over ≤ `maxPieceLen`
    * vocab probes) evaluates ONCE PER DISTINCT WORD — Heaps'-law
    * small — never per occurrence; the per-word piece counts broadcast
    * back onto the exploded token stream and roll up per doc in one
    * shuffle. Greedy-longest-first = argmax over candidate lengths, so
    * the in-row loop needs no data-dependent iteration count.
    *
    * Returns (doc_id, n_words, n_pieces, n_unk) — an [UNK] word
    * contributes exactly one piece.
    */
  def wordpieceStats(
      docs: DataFrame,
      vocab: Seq[String],
      maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    require(vocab.nonEmpty, "wordpieceStats needs a vocab")
    val vLit = typedlit(vocab)
    def finalState(w: org.apache.spark.sql.Column) = {
      val init = when(length(w) > maxWordLen,
        struct((length(w) + 1).as("pos"), lit(1).as("pieces"), lit(1).as("unk")))
        .otherwise(
          struct(lit(1).as("pos"), lit(0).as("pieces"), lit(0).as("unk")))
      val step = (acc: org.apache.spark.sql.Column,
          i: org.apache.spark.sql.Column) => {
        val pos = acc.getField("pos")
        def sub(l: org.apache.spark.sql.Column) =
          call_function("substring", w, pos, l)
        def piece(l: org.apache.spark.sql.Column) =
          when(pos === 1, sub(l)).otherwise(concat(lit("##"), sub(l)))
        val best = array_max(transform(sequence(lit(1), lit(maxPieceLen)),
          l => when(pos + l - 1 <= length(w) &&
            array_contains(vLit, piece(l)), l).otherwise(lit(0))))
        when(acc.getField("unk") === 1 || pos > length(w), acc)
          .otherwise(when(best === 0,
            struct((length(w) + 1).as("pos"), lit(1).as("pieces"),
              lit(1).as("unk")))
            .otherwise(struct((pos + best).as("pos"),
              (acc.getField("pieces") + 1).as("pieces"), lit(0).as("unk"))))
      }
      aggregate(sequence(lit(1), lit(maxWordLen)), init, step)
    }
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val uwStats = tok.select("w").distinct()
      .select(col("w"), finalState(col("w")).as("st"))
      .select(col("w"), col("st.pieces").as("pieces"), col("st.unk").as("unk"))
    tok.join(broadcast(uwStats), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("pieces")).cast("long").as("n_pieces"),
        sum(col("unk")).cast("long").as("n_unk"))
  }
}
