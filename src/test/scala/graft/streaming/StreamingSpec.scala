package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark over the events file stream") {
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    graft.Q.eventTs(spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .limit(500)
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val agg = EventStreams.windowedCounts(stream,
      windowLen = "1 hour", slide = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits windows the watermark has passed; verify the
    // streaming plan accepted watermark + window + agg and ran to the end
    val batch = graft.Q.eventTs(
        spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
    assert(batch.count() > 0)
    assert(spark.table("win_counts").columns.toSeq ==
      Seq("w_start", "w_end", "event_type", "n", "total_value"))
  }

  test("stateful sessionization matches the batch window computation") {
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val sessions = EventStreams.sessionize(spark, events, gapSec = 1800)
      .cache()
    // total events preserved
    assert(sessions.agg(sum("n_events")).head().getLong(0) ==
      events.count())
    // session count per user equals the batch gaps-and-islands count (q16)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batchSessions = events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("new_s", when($"prev".isNull ||
        $"us" - $"prev" > 1800000000L, 1L).otherwise(0L))
      .groupBy($"user_id").agg(sum($"new_s").as("n_sessions"))
    val got = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val diff = got.join(batchSessions, "user_id")
      .filter(got("n_sessions") =!= batchSessions("n_sessions")).count()
    assert(diff == 0)
  }

  test("streaming as-of enrichment equals the batch AsOfJoin") {
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val got = EventStreams.asOfEnrich(spark, events)
      .select($"event_id", $"user_id", $"query_us", $"state_us",
        $"state_value")
    // batch reference: same query via the as-of operator (q43 shape,
    // minus the per-(user, ts) pre-aggregation — the streaming state
    // keeps the LAST purchase at equal ts, so tie-break on event order)
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("p_id"),
        $"value".as("pval"))
    val want = graft.operators.AsOfJoin.asOf(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("pval"),
        rightTieBreak = Seq("p_id"))
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("query_us"),
        unix_micros($"asof_ts").as("state_us"),
        $"asof_pval".as("state_value"))
    assert(got.count() === clicks.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("as-of enrichment state carries across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val stream = mem.toDF()
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = EventStreams.asOfEnrich(spark, stream)
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // batch 1: a purchase, then a click strictly after it
    mem.addData((1L, 1000L, 7L, "purchase", 5.0),
      (2L, 2000L, 7L, "click", 0.0))
    q.processAllAvailable()
    // batch 2: a later click must still see batch 1's purchase state
    mem.addData((3L, 3000L, 7L, "click", 0.0))
    q.processAllAvailable()
    val rows = spark.table("asof_out").orderBy("event_id").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getLong(r.fieldIndex("state_us")) === 1000L))
    assert(rows.forall(r =>
      r.getDouble(r.fieldIndex("state_value")) === 5.0))
  }

  test("streaming HLL registers equal the batch sketch and estimates " +
      "match (engine-incremental sketch maintenance)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("us", "user_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val q = EventStreams.hllRegisterStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_regs").start()
    val sample = events
      .select(unix_micros($"ts"), $"user_id", $"event_type")
      .as[(Long, Long, String)].collect()
    // two micro-batches: the sketch must merge across them
    val (b1, b2) = sample.splitAt(sample.length / 2)
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("hll_regs")
    val want = graft.operators.Hll.registers(
      events.select($"event_type",
        window($"ts", "1 hour").as("win"), $"user_id"),
      Seq("event_type", "win"), "user_id")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val estGot = graft.operators.Hll.estimate(
      graft.operators.Hll.merge(got, Seq("event_type")),
      Seq("event_type"))
    val estWant = graft.operators.Hll.estimate(
      graft.operators.Hll.merge(want, Seq("event_type")),
      Seq("event_type"))
    assert(estGot.except(estWant).isEmpty &&
      estWant.except(estGot).isEmpty)
  }

  test("streaming quantile-histogram equals the batch sketch and " +
      "P50/P99 match (sum-mergeable sketch as engine state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val stream = mem.toDF().toDF("us", "value", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val q = EventStreams.quantileHistStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("qh_regs").start()
    val sample = events
      .select(unix_micros($"ts"), $"value", $"event_type")
      .as[(Long, Double, String)].collect()
    val (b1, b2) = sample.splitAt(sample.length / 2)
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("qh_regs")
    val want = graft.operators.QuantileHist.histogram(
      events.select($"event_type",
        window($"ts", "1 hour").as("win"),
        round($"value" * 100, 0).cast("long").as("v")),
      Seq("event_type", "win"), "v")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val estGot = graft.operators.QuantileHist.quantiles(
      graft.operators.QuantileHist.merge(got, Seq("event_type")),
      Seq("event_type"), Seq(50, 99))
    val estWant = graft.operators.QuantileHist.quantiles(
      graft.operators.QuantileHist.merge(want, Seq("event_type")),
      Seq("event_type"), Seq(50, 99))
    assert(estGot.except(estWant).isEmpty &&
      estWant.except(estGot).isEmpty)
  }

  test("streaming anomaly gate scores equal the batch computation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val med = events.groupBy($"event_type")
      .agg(round(percentile($"value", lit(0.5)), 4).as("med"))
    val stats = events.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(round(percentile(abs($"value" - $"med"), lit(0.5)), 4)
        .as("mad"))
      .join(med, "event_type")
    // stream the same events through the gate from a memory source
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "event_type", "value")
    val gated = EventStreams.anomalyGate(stream, stats)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    val sample = events.select($"event_id", $"event_type", $"value")
      .limit(300).as[(Long, String, Double)].collect()
    mem.addData(sample.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anom_out")
      .select($"event_id", round($"mz", 6).as("mz"), $"is_anomaly")
    val batch = EventStreams.anomalyGate(
        events.select($"event_id", $"event_type", $"value")
          .limit(300), stats)
      .select($"event_id", round($"mz", 6).as("mz"), $"is_anomaly")
    assert(got.count() == 300)
    assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
  }

  test("native session_window agg matches a strict-boundary batch " +
      "sessionizer on real events") {
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val got = EventStreams.sessionWindowAgg(events, gapSec = 1800)
      .select($"user_id", unix_micros($"s_start").as("start_us"),
        $"n_events")
    // reference: lag/cumsum sessionizer with session_window's STRICT
    // boundary (new session at diff >= gap, since a session covers
    // [first, last + gap) exclusive)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val ref = events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("brk",
        when($"us" - lag($"us", 1).over(w) >= 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum($"brk").over(w))
      .groupBy($"user_id", $"sid")
      .agg(min($"us").as("start_us"), count(lit(1)).as("n_events"))
      .select($"user_id", $"start_us", $"n_events")
    assert(got.count() == ref.count())
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
  }

  test("stream-stream attribution join equals the batch interval join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val imps = events.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val clks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    implicit val sqlCtx = spark.sqlContext
    val memI = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val si = memI.toDF().toDF("event_id", "user_id", "ts")
    val sc = memC.toDF().toDF("event_id", "user_id", "ts")
    val joined = EventStreams.attributionJoin(si, sc,
      horizonSec = 7 * 86400, watermark = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, java.sql.Timestamp)].collect().toIndexedSeq
    memI.addData(rows(imps))
    memC.addData(rows(clks))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out")
      .select($"imp_id", $"click_id").as[(Long, Long)].collect().toSet
    val batch = EventStreams.attributionJoin(imps, clks,
        horizonSec = 7 * 86400)
      .select($"imp_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no attributable pairs")
    assert(got == batch)
  }

  test("leftOuter attribution emits unmatched impressions after the " +
      "watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // away from epoch 0: a row whose event time equals the engine's
    // INITIAL watermark (0) is discarded as late before it ever reaches
    // the join state
    def ts(min: Long) = new java.sql.Timestamp((1000 + min) * 60000L)
    val memI = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.attributionJoin(
      memI.toDF().toDF("event_id", "user_id", "ts"),
      memC.toDF().toDF("event_id", "user_id", "ts"),
      horizonSec = 600, watermark = "10 minutes", joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    // imp 1 gets a click inside the 10-min horizon; imp 2 never does
    memI.addData(Seq((1L, 7L, ts(0)), (2L, 8L, ts(1))))
    memC.addData(Seq((10L, 7L, ts(5))))
    q.processAllAvailable()
    // advance BOTH watermarks far past imp_ts + horizon so the engine
    // can prove imp 2 is unmatched and emit its null row
    memI.addData(Seq((99L, 99L, ts(600))))
    memC.addData(Seq((98L, 99L, ts(600))))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr_outer")
      .select($"imp_id", $"click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(out.get(1L) == Some(Some(10L)), s"matched pair wrong: $out")
    assert(out.get(2L) == Some(None),
      s"unmatched impression not emitted with null click: $out")
  }

  test("anomaly gate surfaces unknown event types and zero-MAD stats " +
      "as null scores instead of dropping/NaN") {
    val stats = Seq(("click", 5.0, 2.0), ("flat", 1.0, 0.0))
      .toDF("event_type", "med", "mad")
    val events = Seq((1L, "click", 100.0), (2L, "never_seen", 9.9),
      (3L, "flat", 1.0)).toDF("event_id", "event_type", "value")
    val out = EventStreams.anomalyGate(events, stats)
      .orderBy($"event_id").collect()
    assert(out.length === 3) // the unknown type is NOT dropped
    assert(out(0).getBoolean(out(0).fieldIndex("is_anomaly")))
    assert(out(1).isNullAt(out(1).fieldIndex("mz")) &&
      out(1).isNullAt(out(1).fieldIndex("is_anomaly")))
    assert(out(2).isNullAt(out(2).fieldIndex("mz")) &&
      out(2).isNullAt(out(2).fieldIndex("is_anomaly")))
  }

  /** Chained watermarked aggregations (bucket counts → per-window
    * histogram map) + broadcast stream-static reference join + the
    * row-local PSI fold: streaming rows must equal the identical batch
    * computation through the SHARED psiVsRef, window for window. A
    * far-future sentinel closes every real window (append mode emits
    * only closed windows); the sentinel's own window stays open and
    * must NOT be emitted. */
  test("streaming drift gate (chained windowed aggs) equals the " +
      "batch PSI computation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val sample = events
      .select(unix_micros($"ts"), $"value", $"event_type")
      .as[(Long, Double, String)].collect().sortBy(_._1)
    // reference = the first half of history, built in batch
    val ref = EventStreams.referenceHistogram(
      sample.take(sample.length / 2).toSeq
        .toDF("us", "value", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)")))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val stream = mem.toDF().toDF("us", "value", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val q = EventStreams.driftGate(stream, ref)
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_rows").start()
    mem.addData(sample.toIndexedSeq); q.processAllAvailable()
    val maxUs = sample.map(_._1).max
    val sentinelUs = maxUs + 10L * 86400L * 1000000L
    mem.addData(Seq((sentinelUs, 1.0, "click"))); q.processAllAvailable()
    q.stop()
    val got = spark.table("drift_rows")
    assert(got.count() > 0)
    // no open window leaks: the sentinel's window end is beyond the
    // last real event by days
    import java.sql.Timestamp
    val lastEmitted = got.agg(max($"w_end")).head.getTimestamp(0)
    assert(lastEmitted.getTime * 1000L < sentinelUs)
    // batch parity through the shared scoring path
    val histsB = events
      .select($"event_type", window($"ts", "1 hour").as("win"),
        graft.operators.QuantileHist.bucketIdx(floor($"value"))
          .as("bucket"))
      .groupBy($"event_type", $"win", $"bucket")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type", $"win")
      .agg(map_from_entries(collect_list(struct($"bucket", $"cnt")))
        .as("cur"))
    val want = EventStreams.psiVsRef(histsB, ref, 0.25)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"streaming=${got.count()} batch=${want.count()} " +
        s"onlyS=${got.except(want).count()} onlyB=${want.except(got).count()}")
  }

  /** The production rollout pattern for the drift monitor: the
    * reference histogram is recomputed from accumulated history
    * between deployments and the gate restarts against the new
    * broadcast — early windows score against ref v1, later windows
    * against ref v2, each proven window-for-window against the shared
    * batch scorer. Also asserts the stateful operators hold
    * SKETCH-bounded state (≈ distinct (type, win, bucket) + histogram
    * rows), never O(events): the QuantileHist scale contract, measured
    * from the query's own state-operator metrics. */
  test("drift gate across a reference rollout: updated histogram " +
      "scores later windows; state stays sketch-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Q.eventTs(
      spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val sample = events
      .select(unix_micros($"ts"), $"value", $"event_type")
      .as[(Long, Double, String)].collect().sortBy(_._1)
    val (t0, rest) = sample.splitAt(sample.length / 3)
    val (t1, t2) = rest.splitAt(rest.length / 2)
    def toDf(xs: Array[(Long, Double, String)]) =
      xs.toSeq.toDF("us", "value", "event_type")
        .withColumn("ts", expr("timestamp_micros(us)"))
    def histsOf(xs: Array[(Long, Double, String)]) = toDf(xs)
      .select($"event_type", window($"ts", "1 hour").as("win"),
        graft.operators.QuantileHist.bucketIdx(floor($"value"))
          .as("bucket"))
      .groupBy($"event_type", $"win", $"bucket")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type", $"win")
      .agg(map_from_entries(collect_list(struct($"bucket", $"cnt")))
        .as("cur"))
    implicit val sqlCtx = spark.sqlContext
    val sentinel = (sample.map(_._1).max + 10L * 86400L * 1000000L,
      1.0, "click")
    def runGate(ref: org.apache.spark.sql.DataFrame, sink: String,
        feed: Array[(Long, Double, String)]): Long = {
      val mem = MemoryStream[(Long, Double, String)]
      val q = EventStreams.driftGate(
          mem.toDF().toDF("us", "value", "event_type")
            .withColumn("ts", expr("timestamp_micros(us)")), ref)
        .writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      mem.addData(feed.toIndexedSeq); q.processAllAvailable()
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      mem.addData(Seq(sentinel)); q.processAllAvailable()
      q.stop()
      stateRows
    }
    // deployment 1: reference from initial history, gate sees t1
    val ref1 = EventStreams.referenceHistogram(toDf(t0))
    val state1 = runGate(ref1, "drift_v1", t1)
    // rollout: reference recomputed over ALL history so far; the
    // restarted gate scores t2's windows against the NEW broadcast
    val ref2 = EventStreams.referenceHistogram(toDf(t0 ++ t1))
    runGate(ref2, "drift_v2", t2)
    val got1 = spark.table("drift_v1")
    val got2 = spark.table("drift_v2")
    assert(got1.count() > 0 && got2.count() > 0)
    val want1 = EventStreams.psiVsRef(histsOf(t1), ref1, 0.25)
    val want2 = EventStreams.psiVsRef(histsOf(t2), ref2, 0.25)
    assert(got1.except(want1).isEmpty && want1.except(got1).isEmpty,
      "v1 windows must score against ref v1")
    assert(got2.except(want2).isEmpty && want2.except(got2).isEmpty,
      "post-rollout windows must score against ref v2")
    // the two references genuinely differ (the rollout changed the
    // broadcast), else the test proves nothing — compared via exploded
    // entries (set ops are unsupported on MAP columns)
    def refRows(r: org.apache.spark.sql.DataFrame) =
      r.select($"event_type", explode($"ref").as(Seq("bucket", "cnt")))
    assert(refRows(ref1).except(refRows(ref2)).count() > 0)
    // sketch-bounded state: ≈ bucket rows + histogram rows for live
    // windows (2× slack for both chained operators' bookkeeping),
    // and strictly below the event count — never O(events)
    val bucketRows = toDf(t1)
      .select($"event_type", window($"ts", "1 hour"),
        graft.operators.QuantileHist.bucketIdx(floor($"value")))
      .distinct().count()
    val histRows = toDf(t1)
      .select($"event_type", window($"ts", "1 hour")).distinct().count()
    assert(state1 <= 2 * (bucketRows + histRows) && state1 < t1.length,
      s"state=$state1 events=${t1.length} buckets=$bucketRows " +
        s"hists=$histRows — state must track the sketch, not the feed")
  }

  test("psiVsRef surfaces an event type absent from the reference " +
      "as drifted instead of dropping it") {
    val hists = Seq("known", "never_seen").toDF("event_type")
      .withColumn("win", expr(
        "named_struct('start', timestamp_micros(0), " +
          "'end', timestamp_micros(3600000000))"))
      .withColumn("cur", expr("map(1L, 5L, 2L, 5L)"))
    val ref = Seq("known").toDF("event_type")
      .withColumn("ref", expr("map(1L, 5L, 2L, 5L)"))
    val out = EventStreams.psiVsRef(hists, ref, 0.25)
      .orderBy($"event_type").collect()
    assert(out.length === 2, "the unknown type must NOT be dropped")
    assert(out(0).getString(0) === "known" &&
      out(0).getDouble(out(0).fieldIndex("psi")) === 0.0 &&
      !out(0).getBoolean(out(0).fieldIndex("drifted")))
    assert(out(1).getString(0) === "never_seen" &&
      out(1).isNullAt(out(1).fieldIndex("psi")) &&
      out(1).getBoolean(out(1).fieldIndex("drifted")),
      s"no-reference row must emit null psi + drifted=true: ${out(1)}")
  }
}
