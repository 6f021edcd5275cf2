package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.queries.CoreQueries

/** Streaming ≡ batch over the REAL sf0.001 tables: each streaming
  * operator's final state must equal the corresponding batch query's
  * result — and the batch results are the ones the DuckDB oracle gate
  * hash-checks, so these specs chain the streaming path to the oracle.
  *
  * Inputs are fed through MemoryStream in several event-time-ordered
  * micro-batches (the per-key in-order contract the operators document);
  * where an operator only emits on watermark advance, a far-future
  * sentinel row flushes it and is excluded from the comparison.
  */
class StreamingBatchEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val SfDir = "/root/testdata/sf0.001"
  val Batches = 4

  private def chunks[T](xs: Seq[T]): Seq[Seq[T]] = {
    val n = math.max(1, (xs.length + Batches - 1) / Batches)
    xs.grouped(n).toSeq
  }

  private def events: DataFrame =
    graft.etl.Ingest.table(spark, SfDir, "events")

  test("StreamingBilling over sf0.001 events ≡ k1_state_machine (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("k1_state_machine")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("key").toString ->
        (r.getAs[Long]("running_us"), r.getAs[Long]("stopped_us")))
      .toMap

    // events → VmActions exactly as CoreQueries.eventState maps them:
    // signup/click/purchase/view are create/<skip>/stop/shelve, error
    // rides the message=="Error" path. click maps to no trigger — the
    // state machine must skip it on both sides.
    val acts = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map { r =>
        val action = r.getAs[String]("event_type") match {
          case "signup" => "create"
          case "purchase" => "stop"
          case "view" => "shelve"
          case other => other // click / error: no trigger
        }
        val message = if (r.getAs[String]("event_type") == "error") "Error" else ""
        StreamingBilling.VmAction(r.getAs[Long]("user_id").toString,
          r.getAs[Long]("ts_us"), action, message, r.getAs[Long]("event_id"))
      }
      .sortBy(a => (a.ts_us, a.event_id)).toSeq

    val input = MemoryStream[StreamingBilling.VmAction]
    val totals = StreamingBilling.runtimeTotals(
      input.toDS(), CoreQueries.WStart, CoreQueries.WEnd)
    val q = totals.writeStream
      .format("memory").queryName("equiv_billing")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(acts).foreach { c => input.addData(c); q.processAllAvailable() }
      // close every open state at the window end the way the batch plan
      // does (final run closes at iv_end): a flush delete per key at a
      // time that clamps to WEnd
      val keys = acts.map(_.instance_uuid).distinct
      input.addData(keys.map(k =>
        StreamingBilling.VmAction(k, CoreQueries.WEnd + 1L, "delete", "",
          Long.MaxValue)))
      q.processAllAvailable()

      // data events never map to Deleted, so the one Deleted row per key
      // is the flushed final state
      val fin = spark.table("equiv_billing")
        .filter(col("current_state") === "Deleted")
        .collect()
        .map(r => r.getAs[String]("instance_uuid") ->
          (r.getAs[Long]("running_us"), r.getAs[Long]("stopped_us")))
        .toMap
      assert(fin.size == keys.size)
      batch.foreach { case (k, totals) =>
        assert(fin(k) == totals, s"key $k: streaming ${fin(k)} != batch $totals")
      }
      // keys the batch plan drops (no state-mapped events) must have
      // folded to zero
      (fin.keySet -- batch.keySet).foreach { k =>
        assert(fin(k) == ((0L, 0L)), s"batch-absent key $k has nonzero totals")
      }
    } finally q.stop()
  }

  test("StreamingDedup first-arrivals ≡ exactGroups canonical ids (dedup_exact operator)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // sf0.001 documents are all-distinct; double the corpus (clone ids
    // offset, arriving LATER) so the stream actually drops duplicates
    val docs = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .sortBy(_._1).toSeq
    val doubled = docs ++ docs.map { case (id, t) => (id + 1000000L, t) }

    val batch = graft.ops.DedupOps.exactGroups(
      doubled.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[String]("text_md5") ->
        (r.getAs[Long]("canonical_doc_id"), r.getAs[Long]("n_copies")))
      .toMap

    val input = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.firstArrivals(
      input.toDS().toDF("doc_id", "text")
        // arrival order = doc_id order, so first-arrival == min(doc_id),
        // the batch canonical rule
        .withColumn("ets", timestamp_micros(lit(CoreQueries.WStart) + col("doc_id"))),
      "ets", "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("equiv_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(doubled).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_dedup")
        .collect()
        .map(r => r.getAs[String]("text_md5") -> r.getAs[Long]("doc_id"))
      // exactly one emission per distinct hash, and it is the batch
      // canonical (min doc_id)
      assert(fin.length == batch.size)
      fin.foreach { case (h, id) =>
        assert(batch(h)._1 == id, s"hash $h: streaming kept $id, batch canonical ${batch(h)._1}")
        assert(batch(h)._2 == 2L)
      }
    } finally q.stop()
  }

  test("stateless curation + span corruption stream ≡ their oracle-checked batch queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch truths — the exact frames the DuckDB oracle gate hash-checks
    val batchKeep = graft.SparkEntry.queries("text_gopher_rules")(spark, SfDir)
      .select("doc_id", "keep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val batchSc = graft.SparkEntry.queries("text_span_corrupt")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("input"), r.getAs[String]("target"),
          r.getAs[Long]("n_masked")))).toMap

    val docs = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq

    // the streaming pipeline applies the SAME column expressions the
    // batch queries use (gopherRules / spanCorrupt are shared functions,
    // so the two paths cannot drift) — both ops are stateless maps, the
    // form that streams with no watermark or state at all
    val input = MemoryStream[(Long, String)]
    val out = input.toDS().toDF("doc_id", "text")
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
      .select(col("doc_id"),
        graft.ops.TextOps.gopherRules(col("toks")).getField("keep").as("keep"),
        graft.ops.TextOps.spanCorrupt(col("doc_id"), col("toks"), 3, 15).as("sc"))
      .select(col("doc_id"), col("keep"), col("sc.input").as("input"),
        col("sc.target").as("target"), col("sc.n_masked").as("n_masked"))
    val q = out.writeStream
      .format("memory").queryName("equiv_curate")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(docs).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_curate").collect()
      assert(fin.length == docs.length)
      fin.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(r.getAs[Boolean]("keep") == batchKeep(id), s"doc $id keep")
        assert((r.getAs[String]("input"), r.getAs[String]("target"),
          r.getAs[Long]("n_masked")) == batchSc(id), s"doc $id corruption")
      }
    } finally q.stop()
  }

  test("trained-classifier scoring streams unchanged ≡ batch quality_lr_score (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch truth — the exact frame the DuckDB oracle gate hash-checks
    val batch = graft.SparkEntry.queries("quality_lr_score")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("logit_fp"), r.getAs[Boolean]("pred")))).toMap

    // train on the BATCH table (the model is a batch artifact); the
    // stream then scores with the weights as literals — the stateless
    // trained-artifact-serves-the-stream shape
    val d = graft.etl.Ingest.table(spark, SfDir, "documents")
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
    val xs = graft.ops.ClassifierOps.features(col("toks"))
    val w = graft.ops.ClassifierOps.trainLogistic(d, xs, col("lang") === "en")

    val docs = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq

    val input = MemoryStream[(Long, String)]
    val out = input.toDS().toDF("doc_id", "text")
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
      .filter(graft.ops.ClassifierOps.featurable(col("toks")))
      .select(col("doc_id"),
        graft.ops.ClassifierOps.marginFixed(w,
          graft.ops.ClassifierOps.microFeatures(col("toks"))).as("logit_fp"),
        (graft.ops.ClassifierOps.marginFixed(w,
          graft.ops.ClassifierOps.microFeatures(col("toks"))) >= 0L).as("pred"))
    val q = out.writeStream
      .format("memory").queryName("equiv_lr")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(docs).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_lr").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("logit_fp"), r.getAs[Boolean]("pred")))).toMap
      assert(fin == batch, s"streaming ${fin.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("StreamingContamination stream-static join ≡ batch dedup_contamination (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch truth — the exact frame the DuckDB oracle gate hash-checks
    val batch = graft.SparkEntry.queries("dedup_contamination")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated"))
      .toMap

    val allDocs = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    // static side: the benchmark corpus (doc_id % 10 == 0), as in batch
    val benchSh = graft.ops.DedupOps.shingled(
      graft.etl.Ingest.table(spark, SfDir, "documents")
        .filter(pmod(col("doc_id"), lit(10)) === 0))
    val trainDocs = allDocs.filter(_._1 % 10 != 0)

    val input = MemoryStream[(Long, String)]
    val out = StreamingContamination.contaminationCounts(
      input.toDS().toDF("doc_id", "text"), benchSh)
    val q = out.writeStream
      .format("memory").queryName("equiv_contam")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      chunks(trainDocs).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_contam").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated"))
        .toMap
      assert(fin == batch, s"streaming ${fin.size} rows vs batch ${batch.size}")
    } finally q.stop()
  }

  test("StreamingSessions closed sessions ≡ batch sessionize stats (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("sessionize")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("max_session_us")))
      .toMap

    val evs = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .collect()
      .map(r => StreamingSessions.SessionEvent(
        r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
      .sortBy(e => (e.ts_us, e.event_id)).toSeq
    val maxTs = evs.map(_.ts_us).max
    val Sentinel = -1L

    val input = MemoryStream[StreamingSessions.SessionEvent]
    val withTime = input.toDS()
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", "0 seconds")
      .as[StreamingSessions.SessionEvent]
    val sessions = StreamingSessions.sessionize(withTime)
    val q = sessions.writeStream
      .format("memory").queryName("equiv_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      // two sentinel batches: the first advances the watermark past every
      // session's timeout, the second gives the timed-out state a batch
      // to fire in
      input.addData(StreamingSessions.SessionEvent(Sentinel, maxTs + 10L * 3600L * 1000000L, 1L))
      q.processAllAvailable()
      input.addData(StreamingSessions.SessionEvent(Sentinel, maxTs + 20L * 3600L * 1000000L, 2L))
      q.processAllAvailable()

      val fin = spark.table("equiv_sessions")
        .filter(col("user_id") =!= Sentinel)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          max(col("session_end_us") - col("session_start_us")).as("max_session_us"))
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
            r.getAs[Long]("max_session_us")))
        .toMap
      assert(fin == batch)
    } finally q.stop()
  }

  test("StreamingSmoothing EMA ≡ batch ts_ema (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("ts_ema")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("ema_micro"))
      .toMap

    val evs = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => StreamingSmoothing.ValueEvent(
        r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .sortBy(e => (e.ts_us, e.event_id)).toSeq

    val input = MemoryStream[StreamingSmoothing.ValueEvent]
    val smoothed = StreamingSmoothing.emaStream(input.toDS())
    val q = smoothed.writeStream
      .format("memory").queryName("equiv_ema")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_ema")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          r.getAs[Long]("ema_micro"))
        .toMap
      assert(fin == batch,
        s"${fin.size} streaming rows vs ${batch.size} batch rows")
    } finally q.stop()
  }

  test("StreamingAnomaly rolling z-score ≡ batch ts_anomaly (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("ts_anomaly")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("z_micro"), r.getAs[Long]("is_anomaly")))
      .toMap

    val evs = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => StreamingAnomaly.ValueEvent(r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value")))
      .sortBy(e => (e.ts_us, e.event_id)).toSeq

    val input = MemoryStream[StreamingAnomaly.ValueEvent]
    val q = StreamingAnomaly.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_anomaly")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      val fin = spark.table("equiv_anomaly")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          (r.getAs[Long]("z_micro"), r.getAs[Long]("is_anomaly")))
        .toMap
      assert(fin == batch,
        s"${fin.size} streaming rows vs ${batch.size} batch rows")
    } finally q.stop()
  }

  test("StreamingSummary incremental maintenance ≡ batch cdc_agg_merge (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("cdc_agg_merge")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_micro"),
          r.getAs[Long]("min_micro"), r.getAs[Long]("max_micro"),
          r.getAs[Long]("avg_micro")))
      .toMap

    // arrival order deliberately scrambled: the summary combiners are
    // commutative, so unlike the EMA fold no event-time contract exists
    val evs = events.select(col("user_id"), col("value"), col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        r.getAs[Long]("event_id")))
      .sortBy(e => e._3 % 7)
      .map(e => StreamingSummary.ValueEvent(e._1, e._2)).toSeq

    val input = MemoryStream[StreamingSummary.ValueEvent]
    val q = StreamingSummary.summaryStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_summary")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      // update mode emits every revision; n is monotone per key, so the
      // max-n row per key is the final summary
      val fin = spark.table("equiv_summary")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n").desc)))
        .filter(col("rk") === 1)
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n"), r.getAs[Long]("sum_micro"),
            r.getAs[Long]("min_micro"), r.getAs[Long]("max_micro"),
            r.getAs[Long]("avg_micro")))
        .toMap
      assert(fin == batch,
        s"${fin.size} streaming keys vs ${batch.size} batch keys")
    } finally q.stop()
  }

  test("StreamingAggregates windowed stats ≡ batch tumbling aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = events
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[Long]("ts_us")))
      .sortBy(_._3).toSeq
    val maxTs = evs.map(_._3).max

    // batch analog of the same tumbling aggregation over the same rows
    val batch = events
      .groupBy(window(col("ts"), "3600 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("sum_value")))
      .toMap

    val input = MemoryStream[(String, Double, Long)]
    val stats = StreamingAggregates.windowedEventStats(
      input.toDS().toDF("event_type", "value", "ts_us")
        .withColumn("ets", timestamp_micros(col("ts_us"))),
      windowSeconds = 3600, latenessSeconds = 0)
    val q = stats.writeStream
      .format("memory").queryName("equiv_winagg")
      .outputMode(OutputMode.Append())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      // sentinel far past every real window so they all complete and
      // emit; its own window never completes, so it never surfaces
      input.addData(("sentinel", 0.0, maxTs + 30L * 24L * 3600L * 1000000L))
      q.processAllAvailable()

      val fin = spark.table("equiv_winagg")
        .collect()
        .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("sum_value")))
        .toMap
      assert(fin == batch)
    } finally q.stop()
  }

  test("StreamingJoins within-window join ≡ batch join with the same condition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // correlate each signup with the same user's purchases within 6h —
    // both sides cut from the REAL event log
    val all = events
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
    val leftRows = all.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val rightRows = all.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("r_id"), col("ts").as("r_ts"))

    val windowSec = 6L * 3600L
    val batch = leftRows.join(rightRows,
        leftRows("user_id") === rightRows("user_id") &&
          rightRows("r_ts") >= leftRows("l_ts") &&
          rightRows("r_ts") <= leftRows("l_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "inner")
      .select(col("l_id"), col("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    def shape(ms: MemoryStream[(Long, Long, Long)], idCol: String, tsCol: String) =
      ms.toDS().toDF("user_id", idCol, "ts_us")
        .withColumn(tsCol, timestamp_micros(col("ts_us"))).drop("ts_us")
    val joined = StreamingJoins.joinWithin(
      shape(lIn, "l_id", "l_ts"), shape(rIn, "r_id", "r_ts"),
      "user_id", "l_ts", "r_ts", windowSec)
    val q = joined.select("l_id", "r_id").writeStream
      .format("memory").queryName("equiv_join")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // both sides as (user_id, id, epoch_us), fed in event-time order
      val l = leftRows.select(col("user_id"), col("l_id"), unix_micros(col("l_ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
      val rrows = rightRows.select(col("user_id"), col("r_id"), unix_micros(col("r_ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
      val (lc, rc) = (chunks(l), chunks(rrows))
      (0 until math.max(lc.length, rc.length)).foreach { i =>
        lIn.addData(lc.lift(i).getOrElse(Seq.empty))
        rIn.addData(rc.lift(i).getOrElse(Seq.empty))
        q.processAllAvailable()
      }

      val fin = spark.table("equiv_join")
        .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet
      assert(fin == batch)
    } finally q.stop()
  }

  test("StreamingBootstrap replicate moments reproduce batch a19_bootstrap_ci (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("a19_bootstrap_ci")(spark, SfDir)
      .collect().head
    val (batchLo, batchHi) =
      (batch.getAs[Long]("ci_lo_micro"), batch.getAs[Long]("ci_hi_micro"))

    val evs = events.select(col("event_id"), col("value"))
      .collect()
      .map(r => StreamingBootstrap.ValueEvent(
        r.getAs[Long]("event_id").toString, r.getAs[Double]("value")))
      .toSeq
      .sortBy(_.key.hashCode % 13) // scrambled arrival: sums commute

    val input = MemoryStream[StreamingBootstrap.ValueEvent]
    val q = StreamingBootstrap.replicateStream(input.toDS(), 64)
      .writeStream.format("memory").queryName("equiv_boot")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(evs).foreach { c => input.addData(c); q.processAllAvailable() }
      // n_k is monotone per replicate: the max-n_k revision is final
      val fin = spark.table("equiv_boot")
        .groupBy("b")
        .agg(max(struct(col("n_k"), col("sum_vk_micro"))).as("s"))
        .select(col("b"), col("s.n_k"), col("s.sum_vk_micro"))
        .collect()
        .map(r => (r.getAs[Int]("b"), r.getAs[Long]("sum_vk_micro"),
          r.getAs[Long]("n_k")))
      assert(fin.length == 64)
      // replicate means via the BATCH arithmetic (decimal -> double),
      // then the same order-statistic CI ranks
      val means = fin.map { case (b, sMicro, n) =>
        val s6 = new java.math.BigDecimal(
          java.math.BigInteger.valueOf(sMicro), 6)
        (BigDecimal(s6.doubleValue / n * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, b)
      }.sortBy(identity)
      assert(means(1)._1 == batchLo,
        s"streaming lo ${means(1)._1} vs batch $batchLo")
      assert(means(62)._1 == batchHi,
        s"streaming hi ${means(62)._1} vs batch $batchHi")
    } finally q.stop()
  }

  test("StreamingHll register maintenance ≡ batch profile_hll_registers (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("profile_hll_registers")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("idx")) ->
        r.getAs[Long]("max_rank"))
      .toMap

    // the same per-source shingle multiset, arrival order scrambled:
    // register max is commutative/idempotent, so no order contract
    val shingles = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("source"), explode(
        graft.ops.TextOps.shingles(
          graft.ops.TextOps.tokens(col("text")))).as("shingle"))
      .collect()
      .map(r => StreamingHll.KeyEvent(
        r.getAs[String]("source"), r.getAs[String]("shingle")))
      .toSeq
      .sortBy(e => e.key.hashCode % 11)

    val input = MemoryStream[StreamingHll.KeyEvent]
    val q = StreamingHll.registerStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_hll")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(shingles).foreach { c => input.addData(c); q.processAllAvailable() }
      // update mode emits every revision; the register is monotone, so
      // the max per (group, idx) is the final state
      val fin = spark.table("equiv_hll")
        .groupBy("group", "idx").agg(max("max_rank").as("max_rank"))
        .collect()
        .map(r => (r.getAs[String]("group"), r.getAs[Long]("idx")) ->
          r.getAs[Long]("max_rank"))
        .toMap
      assert(fin == batch,
        s"${fin.size} streaming registers vs ${batch.size} batch registers")
    } finally q.stop()
  }

  test("StreamingReservoir ≡ batch sample_weighted_reservoir (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("sample_weighted_reservoir")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("key"),
        r.getAs[Long]("score_e9"), r.getAs[Long]("rk")))
      .toSet

    // same rows, arrival order scrambled: the A-ES score is a pure
    // function of (key, weight), and running top-k is order-insensitive
    val rows = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect()
      .map(r => StreamingReservoir.WeightedRow(
        r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars").toDouble))
      .toSeq
      .sortBy(e => e.key % 13)

    val input = MemoryStream[StreamingReservoir.WeightedRow]
    val q = StreamingReservoir
      .sampleStream(input.toDS(), graft.queries.PipelineQueries.ReservoirK)
      .writeStream.format("memory").queryName("equiv_reservoir")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(rows).foreach { c => input.addData(c); q.processAllAvailable() }
      // update mode emits every revision; every row ever held in state
      // was emitted, so the global top-k per stratum over ALL emissions
      // IS the final state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("stratum").orderBy(col("score").desc, col("key"))
      val fin = spark.table("equiv_reservoir")
        .select("stratum", "key", "weight", "score").distinct()
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= graft.queries.PipelineQueries.ReservoirK)
        .collect()
        .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("key"),
          // mirror Spark SQL round(double): BigDecimal HALF_UP, not
          // math.round's floor(x+0.5) (they differ on negative .5s)
          BigDecimal(r.getAs[Double]("score") * 1e9)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
          r.getAs[Int]("rk").toLong))
        .toSet
      assert(fin == batch, s"${fin.size} streaming rows vs ${batch.size} batch")
    } finally q.stop()
  }

  test("StreamingReservoir ≡ batch on duplicate rows within a stratum") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 3

    // stratum "a" holds key 1 TWICE (weight 1e6 ⇒ score ≈ 0, the
    // stratum's certain top) and key 3 twice — legitimate duplicate
    // (key, weight) rows the counted state must keep, where the old
    // `.distinct` merge collapsed them to one candidate each
    val rows = Seq(
      StreamingReservoir.WeightedRow("a", 1L, 1e6),
      StreamingReservoir.WeightedRow("a", 1L, 1e6),
      StreamingReservoir.WeightedRow("a", 2L, 3.0),
      StreamingReservoir.WeightedRow("a", 3L, 9.0),
      StreamingReservoir.WeightedRow("a", 3L, 9.0),
      StreamingReservoir.WeightedRow("b", 7L, 2.0),
      StreamingReservoir.WeightedRow("b", 8L, 4.0),
      // final micro-batch touches BOTH strata with near-zero-weight
      // rows (score ≪ everything, never sampled), so each stratum's
      // last emission (the rows past the pre-final table size) IS its
      // final state — no distinct-based reconstruction needed
      StreamingReservoir.WeightedRow("a", 4L, 0.001),
      StreamingReservoir.WeightedRow("b", 9L, 0.001))

    val batch = graft.ops.SampleOps.weightedReservoir(
      rows.toDF("stratum", "key", "weight"),
      "key", "stratum", col("weight"), k)
      .collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("key"),
        r.getAs[Long]("score_e9"), r.getAs[Long]("rk")))
      .toSet

    val input = MemoryStream[StreamingReservoir.WeightedRow]
    val q = StreamingReservoir.sampleStream(input.toDS(), k)
      .writeStream.format("memory").queryName("equiv_reservoir_dup")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(rows.take(4)); q.processAllAvailable()
      input.addData(rows.slice(4, 7)); q.processAllAvailable()
      val before = spark.table("equiv_reservoir_dup").count()
      input.addData(rows.drop(7)); q.processAllAvailable()
      val fin = spark.table("equiv_reservoir_dup")
        .collect().drop(before.toInt)
        .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("key"),
          BigDecimal(r.getAs[Double]("score") * 1e9)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
          r.getAs[Long]("rk")))
        .toSet
      assert(fin == batch, s"stream $fin vs batch $batch")
      // the duplicate key must occupy MULTIPLE ranks in stratum a
      assert(batch.count(t => t._1 == "a" && t._2 == 1L) == 2,
        s"test setup: expected key 1 at two ranks of the batch sample: $batch")
    } finally q.stop()
  }

  test("StreamingTheilSen ≡ batch ts_theil_sen (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("ts_theil_sen")(spark, SfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_pts"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("slope_micro")))
      .toMap

    // same rows, arrival order scrambled: the buffered recompute is
    // order-insensitive because the slope derives from the SORTED buffer
    val rows = events
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .collect()
      .map(r => StreamingTheilSen.Pt(r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us"), r.getAs[Double]("value")))
      .toSeq
      .sortBy(p => p.tsUs % 7)

    val input = MemoryStream[StreamingTheilSen.Pt]
    val q = StreamingTheilSen.slopeStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_theilsen")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(rows).foreach { c => input.addData(c); q.processAllAvailable() }
      // update mode re-emits a key on every batch that touched it; the
      // buffer only grows, so the row with the key's max n_pts IS its
      // final state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("nPts").desc)
      val fin = spark.table("equiv_theilsen")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .collect()
        .map(r => r.getAs[Long]("key") ->
          (r.getAs[Long]("nPts"), r.getAs[Long]("nPairs"),
            r.getAs[Long]("slopeMicro")))
        .toMap
      assert(fin == batch, s"${fin.size} streaming keys vs ${batch.size} batch")
    } finally q.stop()
  }

  test("StreamingDpCounts ≡ batch privacy_dp_counts (oracle-checked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("privacy_dp_counts")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("noise_micro"),
          r.getAs[Long]("n_dp_micro")))
      .toMap

    val rows = graft.etl.Ingest.table(spark, SfDir, "documents")
      .select(col("lang"), col("source"))
      .collect()
      .map(r => StreamingDpCounts.KeyedRow(
        r.getAs[String]("lang"), r.getAs[String]("source")))
      .toSeq

    val input = MemoryStream[StreamingDpCounts.KeyedRow]
    val q = StreamingDpCounts.releaseStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_dp")
      .outputMode(OutputMode.Update())
      .start()
    try {
      chunks(rows).foreach { c => input.addData(c); q.processAllAvailable() }
      // counts only grow: the row with a group's max n is its final state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "source").orderBy(col("n").desc)
      val fin = spark.table("equiv_dp")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
          (r.getAs[Long]("n"), r.getAs[Long]("noiseMicro"),
            r.getAs[Long]("nDpMicro")))
        .toMap
      assert(fin == batch, s"${fin.size} streaming groups vs ${batch.size} batch")
    } finally q.stop()
  }

  test("StreamingDpCounts ≡ batch on NULL and '|'-containing keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the r10-advice cases: a NULL lang (old batch concat_ws dropped
    // it; old stream rendered "null"), and values containing the '|'
    // separator (the old stream key-split mis-parsed them). Parity,
    // not seed uniqueness, is the contract under test.
    val rows = Seq(
      StreamingDpCounts.KeyedRow(null, "s"),
      StreamingDpCounts.KeyedRow(null, "s"),
      StreamingDpCounts.KeyedRow(null, "s"),
      StreamingDpCounts.KeyedRow("a|b", "s"),
      StreamingDpCounts.KeyedRow("a|b", "s"),
      StreamingDpCounts.KeyedRow("a", "b|s"))

    val batch = graft.ops.ProfileOps.dpCounts(
      rows.map(r => (Option(r.lang), Option(r.source)))
        .toDF("lang", "source")
        .select(col("lang"), col("source")),
      Seq("lang", "source"))
      .collect()
      .map(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("source"))) ->
        (r.getAs[Long]("n"), r.getAs[Long]("noise_micro"),
          r.getAs[Long]("n_dp_micro")))
      .toMap

    val input = MemoryStream[StreamingDpCounts.KeyedRow]
    val q = StreamingDpCounts.releaseStream(input.toDS())
      .writeStream.format("memory").queryName("equiv_dp_nullkeys")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(rows.take(3)); q.processAllAvailable()
      input.addData(rows.drop(3)); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "source").orderBy(col("n").desc)
      val fin = spark.table("equiv_dp_nullkeys")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .collect()
        .map(r => (Option(r.getAs[String]("lang")),
          Option(r.getAs[String]("source"))) ->
          (r.getAs[Long]("n"), r.getAs[Long]("noiseMicro"),
            r.getAs[Long]("nDpMicro")))
        .toMap
      assert(fin == batch, s"stream $fin vs batch $batch")
      assert(batch.size == 3, s"expected 3 distinct groups: $batch")
      // seed UNIQUENESS (the r11-advice '|' aliasing): ('a|b','s') and
      // ('a','b|s') joined ambiguously under the plain '|' seed — the
      // length-prefixed contract must draw them DIFFERENT noise
      val n1 = batch((Some("a|b"), Some("s")))._2
      val n2 = batch((Some("a"), Some("b|s")))._2
      assert(n1 != n2,
        s"separator-straddling keys drew identical noise: $n1")
    } finally q.stop()
  }

  test("StreamingTheilSen: buffer past maxPoints fails by key name") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingTheilSen.Pt]
    val q = StreamingTheilSen.slopeStream(input.toDS(), maxPoints = 3)
      .writeStream.format("memory").queryName("theilsen_guard")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((1L to 4L).map(i =>
        StreamingTheilSen.Pt(9L, i * 1000000L, i.toDouble)))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("StreamingTheilSen") ||
        Option(e.getCause).exists(_.getMessage.contains("StreamingTheilSen")),
        e.getMessage)
    } finally q.stop()
  }

  test("StreamingIndexProbe chunked ≡ dedup_embedding_incremental (frozen geometry, oracle-checked)") {
    import spark.implicits._
    import graft.ops.SimilarityOps
    implicit val sqlCtx = spark.sqlContext

    // the oracle-checked batch surface: the odd half probed ONCE
    // against the even half's frozen index
    val batchPairs = graft.SparkEntry
      .queries("dedup_embedding_incremental")(spark, SfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchPairs.nonEmpty, "the batch surface must have pairs")

    val emb = SimilarityOps.withNorm(
      graft.etl.Ingest.table(spark, SfDir, "embeddings")
        .select(col("vec_id"), col("embedding")))
    val existing = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val index = SimilarityOps.LshSlimIndex(
      SimilarityOps.lshIndexEntriesSlim(existing).localCheckpoint(),
      SimilarityOps.lshIndexVectors(existing).localCheckpoint())
    val odd = graft.etl.Ingest.table(spark, SfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(pmod(col("vec_id"), lit(2)) === 1)
      .collect()
      // testdata embeddings are array<float>; widen exactly (float →
      // double is value-preserving, so the stream's cosines are
      // bit-identical to the batch plan's)
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toSeq

    // the stream arrives in chunks; the frozen geometry makes the
    // per-chunk probes independent (bucket placement depends only on
    // the vector and the artifact's width; cross-side pairs only), so
    // the union over chunks must equal the one-shot probe EXACTLY
    val input = MemoryStream[(Long, Array[Double])]
    val acc = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = StreamingIndexProbe.probeEachBatch(
      input.toDF().toDF("vec_id", "embedding"), index,
      graft.queries.PipelineQueries.NearDupThreshold) {
      (pairs, _) =>
        acc ++= pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
    }.start()
    try {
      chunks(odd).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    assert(acc.toSet == batchPairs,
      s"only-stream=${acc.toSet -- batchPairs} " +
        s"only-batch=${batchPairs -- acc.toSet}")
  }
}
