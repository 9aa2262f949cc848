package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Structured Streaming surface (SURVEY.md §2.12). The reference has no
  * streaming operators — this module is the beyond-parity extension for
  * continuous ingest at scale: windowed aggregation with watermarking and
  * stateful sessionization over the `events` stream schema. Batch parquet
  * drives the same plans in tests via `processAllAvailable`.
  */
object EventStreams {

  /** Watermarked sliding-window counts per event_type:
    * readStream → withWatermark → groupBy(window, type). */
  def windowedCounts(events: DataFrame, windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"),
        col("total_value"))

  /** Streaming anomaly gate: score arriving events against STATIC
    * per-type robust stats (the q120 med/MAD surface, computed in batch
    * over history and broadcast into the stream as a stream-static
    * join). The modified z-score and the |z| > threshold flag are
    * row-local, so the stream plan has no stateful operator at all —
    * history-derived statistics updating daily while events score
    * continuously is exactly how a 100 TB anomaly monitor runs. `stats`
    * carries (event_type, med, mad). */
  /** Streaming HLL distinct-count registers per (event_type, hour
    * window): because the HLL sketch in relational form is just
    * max(rho) per (key, bucket) — [[graft.operators.Hll]] — the ENGINE
    * maintains it incrementally as a plain watermarked streaming
    * aggregation: state is bounded at ≤ m register rows per key-window
    * no matter how many events arrive, merges across micro-batches by
    * max-associativity, and needs no custom GroupState. Read the sink
    * table through [[graft.operators.Hll.estimate]] for continuous
    * cardinality estimates — the streaming face of the q140 batch
    * surface. */
  def hllRegisterStream(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    graft.operators.Hll.registers(
      events
        .withWatermark("ts", watermark)
        .select(col("event_type"),
          window(col("ts"), windowLen).as("win"), col("user_id")),
      Seq("event_type", "win"), "user_id")

  /** Streaming quantile-histogram maintenance per (event_type, hour
    * window): [[graft.operators.QuantileHist]]'s log-linear bucket
    * counts are SUM-mergeable, so — exactly like [[hllRegisterStream]]
    * — the relational sketch is a plain watermarked streaming
    * aggregation the engine maintains incrementally: ≤ ~2k count rows
    * per key-window regardless of arrival volume, micro-batches fold
    * in by count addition, no custom GroupState. Read the sink through
    * [[graft.operators.QuantileHist.quantiles]] for continuous P50/P99
    * estimates — the streaming face of the q143 batch surface.
    * `value` is bucketed at cent precision (×100) so sub-unit event
    * values land in distinct buckets. */
  def quantileHistStream(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    graft.operators.QuantileHist.histogram(
      events
        .withWatermark("ts", watermark)
        .select(col("event_type"),
          window(col("ts"), windowLen).as("win"),
          round(col("value") * 100, 0).cast("long").as("v")),
      Seq("event_type", "win"), "v")

  /** Native session-window aggregation — Spark's built-in
    * `session_window` (merging event-time sessions with a fixed
    * inactivity gap), the engine-managed alternative to the custom
    * [[sessionize]] state machine: watermark-bounded state, sessions
    * merge/extend inside the streaming aggregation operator, no
    * user-managed GroupState. Use THIS when per-session output is
    * plain aggregates; use [[sessionize]] when the per-session logic
    * needs arbitrary state. Boundary semantics: a session spans
    * [first_ts, last_ts + gap), so an event exactly `gap` after the
    * last one starts a NEW session (strict <), whereas the batch
    * sessionizer (q134) breaks only at diff > gap — the two agree
    * everywhere except exact-boundary hits. */
  def sessionWindowAgg(events: DataFrame, gapSec: Long = 1800,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("total_value"))

  def anomalyGate(stream: DataFrame, stats: DataFrame,
      threshold: Double = 3.5): DataFrame =
    // LEFT join: an event type with no stats row (never seen in the
    // history batch) is exactly what a monitor must surface, not drop —
    // it flows through with mz/is_anomaly = null for a downstream
    // triage policy to decide. mad = 0 (constant history) would make mz
    // ±Infinity/NaN, so the score is gated to null there too.
    stream.join(broadcast(stats), Seq("event_type"), "left")
      .withColumn("mz", when(col("mad") =!= 0,
        lit(0.6745) * (col("value") - col("med")) / col("mad")))
      .withColumn("is_anomaly",
        when(col("mz").isNotNull, abs(col("mz")) > threshold))
      .drop("med", "mad")

  /** Per-type reference histogram for [[driftGate]]: bucket `value`
    * with the integer-exact QuantileHist index and fold the counts into
    * ONE map row per event_type — kilobyte state, broadcastable, the
    * thing a monitor recomputes daily from history in batch. */
  def referenceHistogram(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        graft.operators.QuantileHist.bucketIdx(floor(col("value")))
          .as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("cnt")))).as("ref"))

  /** Streaming distribution-drift gate — the continuous form of the
    * q168 PSI monitor: per (event_type, tumbling window), the PSI of
    * the window's `value` distribution against the STATIC
    * [[referenceHistogram]]. Two CHAINED watermarked aggregations (the
    * Spark 3.5+ multiple-stateful-operator pattern, watermark
    * propagated through `window_time`): first the sketch-bounded
    * bucket counts — state per (type, window) is ≤2k bucket rows, the
    * QuantileHist scale contract, NOT the raw events — then the
    * per-window histogram folded into one map row. The reference joins
    * in as a broadcast stream-static join and the smoothed PSI fold
    * ((cnt+1)/(n+B) over the KEY UNION of window and reference
    * buckets, B = union size) is row-local higher-order-function
    * arithmetic, so drift scoring adds no state beyond the sketch.
    * Append mode emits one scored row per CLOSED window — exactly the
    * alert feed a 100 TB ingest monitor tails. Spec-gated: streaming
    * rows ≡ the identical batch computation through [[psiVsRef]]. */
  def driftGate(events: DataFrame, refHist: DataFrame,
      windowLen: String = "1 hour", watermark: String = "30 minutes",
      threshold: Double = 0.25): DataFrame = {
    val counts = events
      .withWatermark("ts", watermark)
      .select(col("event_type"), window(col("ts"), windowLen).as("win"),
        graft.operators.QuantileHist.bucketIdx(floor(col("value")))
          .as("bucket"))
      .groupBy(col("event_type"), col("win"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val hists = counts
      .groupBy(col("event_type"),
        window(window_time(col("win")), windowLen).as("win"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("cnt")))).as("cur"))
    psiVsRef(hists, refHist, threshold)
  }

  /** Row-local PSI of per-window histogram maps against the broadcast
    * reference — shared by the streaming gate and its batch parity
    * check. `hists` carries (event_type, win struct, cur map); output
    * (event_type, w_start, w_end, n, psi, drifted) with psi rounded at
    * the emit6 boundary (the map-key fold order is
    * partitioning-dependent, the rounded sum is not).
    *
    * LEFT join on the reference: an event type with NO reference
    * histogram — a brand-new type, arguably maximal drift — must
    * surface, not silently drop (the r11 inner join lost it). Such
    * rows emit psi = null (there is no distribution to score against)
    * and drifted = true, the triage-now signal. */
  def psiVsRef(hists: DataFrame, refHist: DataFrame,
      threshold: Double): DataFrame = {
    val p = "(coalesce(element_at(cur, k), 0L) + 1.0) / (n + size(ks))"
    val q =
      "(coalesce(element_at(ref, k), 0L) + 1.0) / (ref_n + size(ks))"
    hists.join(broadcast(refHist), Seq("event_type"), "left")
      .withColumn("n",
        expr("aggregate(map_values(cur), 0L, (a, x) -> a + x)"))
      .withColumn("ref_n",
        expr("aggregate(map_values(ref), 0L, (a, x) -> a + x)"))
      .withColumn("ks",
        expr("array_union(map_keys(cur), map_keys(ref))"))
      // null ref propagates: ref_n/ks/psi are all null for a type the
      // reference has never seen
      .withColumn("psi", round(expr(
        s"""aggregate(ks, CAST(0.0 AS DOUBLE),
              (acc, k) -> acc + ($p - $q) * ln(($p) / ($q)))"""), 6))
      .select(col("event_type"), col("win.start").as("w_start"),
        col("win.end").as("w_end"), col("n"), col("psi"),
        when(col("ref").isNull, lit(true))
          .otherwise(col("psi") > threshold).as("drifted"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(start: Long, lastUs: Long, n: Int,
      total: Double)

  final case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Int, total_value: Double)

  /** Stateful sessionization with flatMapGroupsWithState: a session closes
    * after `gapSec` of inactivity (processing-time timeout for the stream
    * case; in batch tests the final state flush emits every session). */
  /** Watermarked stream-stream interval join — the canonical two-stream
    * shape (click→impression attribution): each click joins the SAME
    * user's impressions whose timestamp lies in [click_ts - horizon,
    * click_ts]. Both streams carry watermarks and the join condition
    * bounds event time in BOTH directions, which is exactly what lets
    * the engine expire join state: an impression can be dropped once
    * the click watermark passes imp_ts + horizon, so state is
    * O(horizon × arrival rate) regardless of stream length — the
    * requirement for running attribution continuously over months.
    * `joinType` "inner" emits matches as they arrive; "leftOuter"
    * additionally emits unmatched impressions (click columns null) once
    * the watermark proves no future click can match them.
    *
    * Batch parity: the same join expression over static frames gives
    * the identical inner-join row set (spec-checked), so the batch and
    * streaming paths share semantics the way windowedCounts/
    * sessionWindowAgg already do. */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      horizonSec: Long = 3600, watermark: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val imp = impressions.select(col("event_id").as("imp_id"),
        col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") +
          expr(s"INTERVAL $horizonSec SECONDS"),
      joinType)
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }

  def sessionize(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800): DataFrame = {
    import spark.implicits._
    val ds = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Event]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event],
            state: GroupState[List[SessionState]]) =>
          // batch-style: sort this user's events, emit closed sessions
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val gapUs = gapSec * 1000L
          val sessions = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var cur: Option[SessionState] = state.getOption.flatMap(_.headOption)
          for (e <- evs) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = t, n = s.n + 1,
                  total = s.total + e.value))
              case Some(s) =>
                sessions += SessionOut(user, s.start, s.lastUs, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            sessions += SessionOut(user, s.start, s.lastUs, s.n, s.total)
          }
          state.update(Nil)
          sessions.iterator
      }.toDF()
  }

  final case class AsOfState(us: Long, value: Double)

  final case class AsOfOut(event_id: Long, user_id: Long, query_us: Long,
      state_us: java.lang.Long, state_value: java.lang.Double)

  /** Streaming as-of enrichment — the continuous form of
    * [[graft.operators.AsOfJoin]]: each `queryType` event is emitted with
    * the latest strictly-earlier `stateType` event of the same user. Per
    * key the state is ONE (ts, value) pair kept in GroupState, so state
    * size is O(distinct keys), not O(events) — the property that makes
    * this run indefinitely. Strictness matches AsOfJoin.asOf: a state
    * event at the exact query timestamp is not visible (within a batch,
    * events sort by (ts, side) with queries first; a state row carried
    * from an EARLIER batch at the same ts was seen before the query and
    * is visible — event-time ties across triggers are the usual
    * at-least-once caveat of low-watermark streams). */
  def asOfEnrich(spark: SparkSession, events: DataFrame,
      queryType: String = "click",
      stateType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val ds = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Event]
      .filter(e => e.event_type == queryType || e.event_type == stateType)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[AsOfState]) =>
          // µs-precision event time (getTime alone truncates to ms)
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          // strict order: at equal ts the query precedes the state event
          val evs = it.toSeq.sortBy(e =>
            (micros(e.ts), if (e.event_type == queryType) 0 else 1,
              e.event_id))
          var cur: Option[AsOfState] = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[AsOfOut]()
          for (e <- evs) {
            val us = micros(e.ts)
            if (e.event_type == queryType) {
              out += AsOfOut(e.event_id, user, us,
                cur.map(s => java.lang.Long.valueOf(s.us)).orNull,
                cur.map(s => java.lang.Double.valueOf(s.value)).orNull)
            } else {
              if (cur.forall(_.us <= us)) cur = Some(AsOfState(us, e.value))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }.toDF()
  }

  /** Read the events table as a file stream (one-file-per-trigger batch
    * drives it synchronously in tests). `ts` is normalized to LTZ for
    * every lakehouse flavor via [[graft.Q.eventTs]]. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val st = spark.readStream.schema(schema)
      .parquet(s"$dir/events.parquet")
    graft.Q.eventTs(st)
  }
}
