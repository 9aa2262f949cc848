package graft.queries

import graft.Q
import graft.Q.t
import graft.operators.{AsOfJoin, Hll}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: the distributed as-of
  * join (state-as-of-event-time lookups) and value-range window frames
  * (sliding event-time aggregates) — the batch shapes of the streaming
  * surface in graft.streaming.
  *
  * Timestamps are exported as epoch microseconds (BIGINT both sides) per
  * the Q conventions — never raw timestamp values.
  */
object EventTimeQ {

  /** As-of join: each click is joined to the SAME user's most recent
    * strictly-earlier purchase. Purchases are pre-aggregated to one row
    * per (user_id, ts) so the as-of match is deterministic; the Spark
    * side is [[AsOfJoin.asOf]] (single shuffle union + carry-forward
    * window — no range join), the oracle is DuckDB's native ASOF JOIN. */
  val q43 = Q(
    "q43_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("pval"))
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightCols = Seq("pval"))
        .filter($"asof_ts".isNotNull)
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("click_us"),
          unix_micros($"asof_ts").as("purchase_us"),
          $"asof_pval".as("purchase_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, max(value) AS pval
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
      ), c AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
      )
      SELECT c.event_id, c.user_id,
             epoch_us(c.ts) AS click_us,
             epoch_us(p.ts) AS purchase_us,
             p.pval AS purchase_value
      FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts > p.ts
      ORDER BY event_id"""))

  /** Sliding event-time aggregate: per user, count and sum of the last
    * hour's events at every event — a RANGE frame on epoch micros (the
    * batch analog of a sliding watermarked window). One shuffle on
    * user_id; the frame is value-based so ties are handled identically
    * by both engines. */
  val q46 = Q(
    "q46_range_frame",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events")
        .withColumn("us", unix_micros($"ts"))
        .select($"event_id", $"user_id", $"us",
          count(lit(1)).over(w).as("n_1h"),
          round(sum($"value").over(w), 6).as("sum_1h"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS us,
             count(*) OVER w AS n_1h,
             round(sum(value) OVER w, 6) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** As-of join with a staleness tolerance (pandas merge_asof
    * tolerance semantics): LEFT rows always survive; a prior purchase
    * older than 24 h is discarded (null enrichment). Same single
    * union-tag + window shuffle as q43 — the gate is row-local. */
  val q97 = Q(
    "q97_asof_tolerance",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("pval"))
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightCols = Seq("pval"),
          tolerance = Some((l, r) =>
            unix_micros(l) - unix_micros(r) <= 86400000000L))
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("click_us"),
          unix_micros($"asof_ts").as("purchase_us"),
          $"asof_pval".as("purchase_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, max(value) AS pval
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
      ), c AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
      )
      SELECT c.event_id, c.user_id,
             epoch_us(c.ts) AS click_us,
             CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000
                  THEN epoch_us(p.ts) END AS purchase_us,
             CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000
                  THEN p.pval END AS purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts > p.ts
      ORDER BY event_id"""))

  /** Sliding event-time window counts — the BATCH shape of
    * EventStreams.windowedCounts (10-minute windows sliding every 5):
    * each event lands in exactly two epoch-aligned windows. The oracle
    * re-derives the window assignment with integer microsecond
    * arithmetic — exact end to end. */
  val q100 = Q(
    "q100_sliding_window_counts",
    (s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy(window($"ts", "10 minutes", "5 minutes"),
          $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"window.start").as("window_start_us"),
          $"event_type", $"n")
        .orderBy($"window_start_us", $"event_type")
    },
    Some("""
      WITH assigned AS (
        SELECT event_type, epoch_us(ts) AS us,
               unnest([
                 (epoch_us(ts) // 300000000) * 300000000,
                 (epoch_us(ts) // 300000000) * 300000000 - 300000000
               ]) AS ws
        FROM events
      )
      SELECT ws AS window_start_us, event_type, count(*) AS n
      FROM assigned
      WHERE us >= ws AND us < ws + 600000000
      GROUP BY 1, 2
      ORDER BY window_start_us, event_type"""))

  /** Forward as-of join (pandas merge_asof direction='forward'): each
    * click is joined to the SAME user's first purchase AT or AFTER the
    * click (inclusive). Same single union-tag shuffle as q43, mirrored
    * carry; the oracle is DuckDB's native ASOF with the inequality
    * flipped. */
  val q109 = Q(
    "q109_asof_forward",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("pval"))
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightCols = Seq("pval"),
          strict = false, direction = "forward")
        .filter($"asof_ts".isNotNull)
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("click_us"),
          unix_micros($"asof_ts").as("purchase_us"),
          $"asof_pval".as("purchase_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, max(value) AS pval
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
      ), c AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
      )
      SELECT c.event_id, c.user_id,
             epoch_us(c.ts) AS click_us,
             epoch_us(p.ts) AS purchase_us,
             p.pval AS purchase_value
      FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY event_id"""))

  /** Nearest as-of join with tolerance (pandas merge_asof
    * direction='nearest'): each click matches the SAME user's closest
    * purchase within 12 h either way, ties broken backward. One
    * union-tag shuffle; both frames evaluate in one WindowExec. The
    * oracle spells nearest as a ranked candidate join (quadratic per
    * user — fine for an oracle, the thing the engine side avoids). */
  val q110 = Q(
    "q110_asof_nearest",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("pval"))
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightCols = Seq("pval"),
          strict = false, direction = "nearest",
          tolerance = Some((l, r) =>
            abs(unix_micros(l) - unix_micros(r)) <= 43200000000L))
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("click_us"),
          unix_micros($"asof_ts").as("purchase_us"),
          $"asof_pval".as("purchase_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, max(value) AS pval
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
      ), c AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
      ), cand AS (
        SELECT c.event_id, epoch_us(p.ts) AS pus, p.pval,
               row_number() OVER (
                 PARTITION BY c.event_id
                 ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                          CASE WHEN epoch_us(p.ts) <= epoch_us(c.ts)
                               THEN 0 ELSE 1 END) AS rn
        FROM c JOIN p ON c.user_id = p.user_id
        WHERE abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 43200000000
      )
      SELECT c.event_id, c.user_id,
             epoch_us(c.ts) AS click_us,
             cand.pus AS purchase_us,
             cand.pval AS purchase_value
      FROM c LEFT JOIN cand ON cand.event_id = c.event_id AND cand.rn = 1
      ORDER BY c.event_id"""))

  /** Ordered conversion funnel (view → click → purchase): each user's
    * first view, first click within 24 h after that view, first purchase
    * within 24 h after that click — the order-sensitive windowed funnel,
    * not three independent existence tests. Three chained conditional-min windows
    * over the SAME user partitioning = one exchange, three WindowExec,
    * then a per-stage user count. The oracle derives each stage as a
    * grouped min over a join with the previous stage. */
  val q115 = Q(
    "q115_conversion_funnel",
    (s, d) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      val staged = t(s, d, "events")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("t1",
          min(when($"event_type" === "view", $"us")).over(wu))
        .withColumn("t2",
          min(when($"event_type" === "click" && $"us" >= $"t1" &&
            $"us" <= $"t1" + 86400000000L, $"us")).over(wu))
        .withColumn("t3",
          min(when($"event_type" === "purchase" && $"us" >= $"t2" &&
            $"us" <= $"t2" + 86400000000L, $"us")).over(wu))
        .groupBy($"user_id")
        .agg(max($"t1").as("t1"), max($"t2").as("t2"), max($"t3").as("t3"))
      staged.select($"user_id",
          when($"t3".isNotNull, 3).when($"t2".isNotNull, 2)
            .when($"t1".isNotNull, 1).otherwise(0).as("stage"))
        .groupBy($"stage").agg(count(lit(1)).as("n_users"))
        .orderBy($"stage")
    },
    Some("""
      WITH s1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END) AS t1
        FROM events GROUP BY user_id
      ), s2 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
          AND epoch_us(e.ts) <= s1.t1 + 86400000000
        GROUP BY e.user_id
      ), s3 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
          AND epoch_us(e.ts) <= s2.t2 + 86400000000
        GROUP BY e.user_id
      ), staged AS (
        SELECT s1.user_id,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS stage
        FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                LEFT JOIN s3 ON s1.user_id = s3.user_id
      )
      SELECT stage, count(*) AS n_users
      FROM staged GROUP BY stage ORDER BY stage"""))

  /** Cohort retention matrix: users grouped by first-active day, distinct
    * active users per (cohort_day, day_offset). The cohort assignment is
    * a min window over the user partitioning (one exchange), the matrix
    * one distinct aggregation — integer day arithmetic end to end. */
  val q116 = Q(
    "q116_cohort_retention",
    (s, d) => {
      import s.implicits._
      val wu = Window.partitionBy($"user_id")
      t(s, d, "events")
        .withColumn("day", (unix_micros($"ts") / 86400000000L)
          .cast("long"))
        .withColumn("cohort_day", min($"day").over(wu))
        .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .agg(countDistinct($"user_id").as("n_active"))
        .orderBy($"cohort_day", $"day_offset")
    },
    Some("""
      WITH act AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
      ), coh AS (
        SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
      )
      SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM act a JOIN coh c USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_day, day_offset"""))

  /** Event transition matrix (the sankey/path report): per user, events
    * in (ts, event_id) order, lag gives the previous type; counts per
    * (prev_type, event_type) pair. One user-keyed window + one grouped
    * count; '∅' marks session starts. Deterministic because the
    * ordering key (ts, event_id) is unique. */
  val q117 = Q(
    "q117_event_transitions",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"us".asc, $"event_id".asc)
      t(s, d, "events")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_type",
          coalesce(lag($"event_type", 1).over(w), lit("START")))
        .groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"prev_type", $"event_type")
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               coalesce(lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id), 'START') AS prev_type
        FROM events
      )
      SELECT prev_type, event_type, count(*) AS n
      FROM seq GROUP BY 1, 2
      ORDER BY prev_type, event_type"""))

  /** SCD Type-2 dimension build: each user's event-type "status" becomes
    * validity intervals — change rows only (lag filter), valid_to from
    * lead, null valid_to marks the current row. Both windows share the
    * user partitioning and the unique (us, event_id) ordering, and the
    * change filter preserves sort order, so the second window plans with
    * NO new exchange or sort. */
  val q119 = Q(
    "q119_scd2_intervals",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      t(s, d, "events")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .select($"user_id", $"event_type".as("status"),
          $"us".as("valid_from_us"),
          lead($"us", 1).over(Window.partitionBy($"user_id")
            .orderBy($"us", $"event_id")).as("valid_to_us"))
        .orderBy($"user_id", $"valid_from_us")
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
      ), chg AS (
        SELECT user_id, event_type, us, event_id FROM seq
        WHERE prev IS NULL OR prev <> event_type
      )
      SELECT user_id, event_type AS status, us AS valid_from_us,
             lead(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS valid_to_us
      FROM chg
      ORDER BY user_id, valid_from_us"""))

  /** Robust anomaly flags: the Iglewicz-Hoaglin modified z-score
    * 0.6745·(v − median)/MAD per event_type, flag |z| > 3.5. Two grouped
    * exact percentiles (median, then median absolute deviation) with the
    * KB-sized stats broadcast back — the corpus never shuffles twice.
    *
    * Exactness: `value` is 2-decimal, so the whole computation runs in
    * INTEGER space — a = value·100, m2 = 2·median(a), d4 = 2·median(|2a −
    * m2|) are exact BIGINTs (interpolated medians of integers are
    * half-integers; the ×2 restores integrality), and the z-score is the
    * exact rational 1349·(2a − m2) / (1000·d4), emitted as numerator +
    * denominator with the >3.5 gate as an integer compare. A first cut
    * emitted round(z, 4) and died on a TRUE half-boundary at sf0.1
    * (z = 3.85225 exactly — engines' round() split); rationals have no
    * boundary to sit on. */
  val q120 = Q(
    "q120_mad_anomalies",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select($"event_id", $"event_type", $"value",
          round($"value" * 100, 0).cast("long").as("a"))
      val med = ev.groupBy($"event_type")
        .agg(round(percentile($"a", lit(0.5)) * 2, 0).cast("long")
          .as("m2"))
      val wm = ev.join(broadcast(med), "event_type")
      val mad = wm.groupBy($"event_type")
        .agg(round(percentile(abs($"a" * 2 - $"m2"), lit(0.5)) * 2, 0)
          .cast("long").as("d4"))
      wm.join(broadcast(mad), "event_type")
        .withColumn("mz_num", lit(1349L) * ($"a" * 2 - $"m2"))
        .filter(abs($"mz_num") * 2 > lit(7000L) * $"d4")
        .select($"event_id", $"event_type",
          round($"value", 6).as("value"), $"mz_num",
          (lit(1000L) * $"d4").as("mz_den"))
        .orderBy($"event_id")
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, value,
               CAST(round(value * 100) AS BIGINT) AS a
        FROM events
      ), med AS (
        SELECT event_type,
               CAST(round(quantile_cont(a, 0.5) * 2) AS BIGINT) AS m2
        FROM ev GROUP BY event_type
      ), mad AS (
        SELECT e.event_type,
               CAST(round(quantile_cont(abs(e.a * 2 - m.m2), 0.5) * 2)
                 AS BIGINT) AS d4
        FROM ev e JOIN med m USING (event_type)
        GROUP BY e.event_type
      )
      SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
             1349 * (e.a * 2 - m.m2) AS mz_num,
             1000 * d.d4 AS mz_den
      FROM ev e JOIN med m USING (event_type)
                JOIN mad d USING (event_type)
      WHERE abs(1349 * (e.a * 2 - m.m2)) * 2 > 7000 * d.d4
      ORDER BY e.event_id"""))

  /** Cumulative distinct-users growth curve: first-active day per user
    * (ONE distinct-shuffle — the dedup-then-cumsum trick; a
    * distinct-over-expanding-window would be quadratic), new users per
    * day, cumulative total via the partition-offset prefix sum
    * (Ranks.withGlobalPrefixSum — no single-partition window even
    * though the day frame is small). */
  val q129 = Q(
    "q129_user_growth",
    (s, d) => {
      import s.implicits._
      val firstDay = t(s, d, "events")
        .select($"user_id", (unix_micros($"ts") / 86400000000L)
          .cast("long").as("day"))
        .groupBy($"user_id").agg(min($"day").as("day"))
      val perDay = firstDay.groupBy($"day")
        .agg(count(lit(1)).as("new_users"))
      graft.operators.Ranks.withGlobalPrefixSum(
          perDay, Seq($"day".asc), "new_users", "cum_users")
        .select($"day", $"new_users", $"cum_users")
        .orderBy($"day")
    },
    Some("""
      WITH fd AS (
        SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
        FROM events GROUP BY user_id
      ), pd AS (
        SELECT day, count(*) AS new_users FROM fd GROUP BY day
      )
      SELECT day, new_users,
             CAST(sum(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_users
      FROM pd
      ORDER BY day"""))

  /** Time-decayed user activity score: Σ value·2^(−age_days), age
    * measured back from each user's LAST event, with the decay
    * truncated at 20 days (weight < 1e-6 ≈ 0 — the truncated-EWMA
    * standard). The recency-weighted engagement metric feature stores
    * serve, as one corpus pass.
    *
    * Exactness: value is 2-decimal → a = 100·value is an exact BIGINT,
    * day age k is integer division, and the weight is the exact power
    * of two 2^(20−k) by bit shift — so the score accumulates as a
    * BIGINT Σ a·2^(20−k) (≤ 1e11/event: no overflow below ~10^7 events
    * per 2^63), order-independent, and the only float is one final
    * division by 2^20·100. No pow(), no float summation drift.
    *
    * Plan: ONE shuffle — the per-user window max hash-partitions on
    * user_id and the groupBy reuses that partitioning (no second
    * Exchange). No broadcast of a per-user frame (which would break at
    * 10^8 users). */
  val q131 = Q(
    "q131_time_decay_score",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
      t(s, d, "events")
        .select($"user_id", unix_micros($"ts").as("us"),
          round($"value" * 100, 0).cast("long").as("a"))
        .withColumn("k",
          expr("(max(us) OVER (PARTITION BY user_id) - us) div 86400000000"))
        .withColumn("last_us", max($"us").over(w))
        .withColumn("f", expr(
          "CASE WHEN k <= 20 THEN shiftleft(cast(1 as bigint), cast(20 - k as int)) ELSE cast(0 as bigint) END"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"last_us").as("last_us"),
          sum($"a" * $"f").as("score_num"))
        .select($"user_id", $"n_events", $"last_us", $"score_num",
          round($"score_num" / 104857600.0, 6).as("decayed_score"))
        .orderBy($"user_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS a
        FROM events
      ), wm AS (
        SELECT user_id, us, a,
               max(us) OVER (PARTITION BY user_id) AS last_us,
               (max(us) OVER (PARTITION BY user_id) - us) // 86400000000
                 AS k
        FROM ev
      )
      SELECT user_id, count(*) AS n_events, max(last_us) AS last_us,
             CAST(sum(CASE WHEN k <= 20
               THEN a * (CAST(1 AS BIGINT) << CAST(20 - k AS INTEGER))
               ELSE 0 END) AS BIGINT) AS score_num,
             round(CAST(sum(CASE WHEN k <= 20
               THEN a * (CAST(1 AS BIGINT) << CAST(20 - k AS INTEGER))
               ELSE 0 END) AS BIGINT) / 104857600.0, 6)
               AS decayed_score
      FROM wm
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Gap-based batch sessionization (the batch twin of
    * graft.streaming.EventStreams.sessionize; reference-class CCNet/
    * analytics sessionizer): a session closes after 30 min of
    * inactivity. ONE shuffle on user_id — the lag/running-sum windows
    * and the per-session aggregation all share the user-keyed exchange
    * (sessions never span users). Integer end to end: µs timestamps,
    * the 2-decimal value as a scaled BIGINT summed exactly, one final
    * division. Session index via the standard brk/cumsum trick; the
    * running sum is CAST on the oracle side (DuckDB sum() → HUGEINT,
    * the q71 lesson). */
  val q134 = Q(
    "q134_sessionization",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      t(s, d, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
          round($"value" * 100, 0).cast("long").as("a"))
        .withColumn("brk",
          when($"us" - lag($"us", 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum($"brk").over(w))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          min($"us").as("start_us"), max($"us").as("end_us"),
          sum($"a").as("va"))
        .select($"user_id", $"session_idx", $"n_events",
          $"start_us", $"end_us",
          expr("(end_us - start_us) div 1000000").as("dur_sec"),
          round($"va" / 100.0, 2).as("total_value"))
        .orderBy($"user_id", $"session_idx")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS a
        FROM events
      ), brk AS (
        SELECT user_id, event_id, us, a,
               CASE WHEN us - lag(us) OVER
                   (PARTITION BY user_id ORDER BY us, event_id)
                 > 1800000000 THEN 1 ELSE 0 END AS b
        FROM ev
      ), sess AS (
        -- cumsum tie-break must include event_id: same-µs rows would
        -- otherwise be frame-ordered differently than the Spark window
        SELECT user_id, us, a,
               CAST(sum(b) OVER (PARTITION BY user_id
                 ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM brk
      )
      SELECT user_id, session_idx, count(*) AS n_events,
             min(us) AS start_us, max(us) AS end_us,
             (max(us) - min(us)) // 1000000 AS dur_sec,
             round(CAST(sum(a) AS BIGINT) / 100.0, 2) AS total_value
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  /** HLL distinct-user sketch per event type ([[Hll]]): per-(type, day)
    * register tables max-merged up to per-type — the mergeable roll-up
    * path — then estimated, beside the exact distinct count. The oracle
    * computes registers directly per type; register-max associativity
    * means the two-level Spark merge must land on the SAME registers,
    * so the roll-up correctness is inside the hash gate. All surfaces
    * are exact integers except the estimate, a row-local function of
    * exact integers rounded at 6. */
  val q140 = Q(
    "q140_hll_distinct_users",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select($"event_type", $"user_id", to_date($"ts").as("day"))
      val daily = Hll.registers(ev, Seq("event_type", "day"), "user_id")
      val est = Hll.estimate(Hll.merge(daily, Seq("event_type")),
        Seq("event_type"))
      val exact = t(s, d, "events").groupBy($"event_type")
        .agg(count_distinct($"user_id").as("n_exact"))
      est.join(exact, Seq("event_type"))
        .select($"event_type", $"occupied", $"zeros", $"z_scaled",
          $"est_distinct", $"n_exact")
        .orderBy($"event_type")
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               ${DuckOracle.mix(
                 "(CAST(user_id AS UHUGEINT) + 11400714819323198485::UHUGEINT)"
                 + " % 18446744073709551616::UHUGEINT")} AS hu
        FROM events
      ), rb AS (
        SELECT event_type,
               CAST(hu >> 54 AS BIGINT) AS bucket,
               CAST(hu % 18014398509481984::UHUGEINT AS BIGINT) AS rem
        FROM h
      ), rr AS (
        SELECT event_type, bucket,
               CASE WHEN rem = 0 THEN 55
                    ELSE 55 - length(bin(rem)) END AS rho
        FROM rb
      ), reg AS (
        SELECT event_type, bucket, max(rho) AS r FROM rr GROUP BY 1, 2
      ), agg AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS occupied,
               CAST(sum(CASE WHEN r <= 40
                    THEN (CAST(1 AS BIGINT) << (40 - r))
                    ELSE 0 END) AS BIGINT) AS z_occ
        FROM reg GROUP BY 1
      ), fin AS (
        SELECT event_type, occupied,
               CAST(1024 - occupied AS BIGINT) AS zeros,
               CAST(z_occ + (1024 - occupied) * 1099511627776 AS BIGINT)
                 AS z_scaled
        FROM agg
      )
      SELECT f.event_type, f.occupied, f.zeros, f.z_scaled,
             round(CASE WHEN ${Hll.AlphaM2Scaled}
                          / CAST(f.z_scaled AS DOUBLE) <= 2560.0
                         AND f.zeros > 0
                    THEN 1024.0 * ln(1024.0 / CAST(f.zeros AS DOUBLE))
                    ELSE ${Hll.AlphaM2Scaled}
                          / CAST(f.z_scaled AS DOUBLE) END, 6) + 0.0
               AS est_distinct,
             x.n_exact
      FROM fin f JOIN (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
          AS n_exact
        FROM events GROUP BY 1) x USING (event_type)
      ORDER BY f.event_type"""))

  /** The HLL estimator as SQL over a CTE exposing `zeros` (BIGINT) and
    * `z_scaled` (BIGINT) — shared by q140/q142 so all estimate sites
    * are one spelling. */
  private def hllEstSql(p: String): String =
    s"""round(CASE WHEN ${graft.operators.Hll.AlphaM2Scaled}
              / CAST($p.z_scaled AS DOUBLE) <= 2560.0
             AND $p.zeros > 0
        THEN 1024.0 * ln(1024.0 / CAST($p.zeros AS DOUBLE))
        ELSE ${graft.operators.Hll.AlphaM2Scaled}
              / CAST($p.z_scaled AS DOUBLE) END, 6) + 0.0"""

  /** Sketch set algebra: per event-type PAIR, estimated user overlap by
    * inclusion-exclusion over HLL registers — est(A) + est(B) −
    * est(A∪B), where the union sketch is just the element-wise max of
    * the two register sets (unions are EXACT in sketch space; only the
    * cardinality readout is approximate). Beside it, the exact
    * intersection via a distinct-pair self-join. At 100 TB the sketch
    * path answers "how much do sources overlap?" from m-row register
    * tables without ever joining raw id sets. */
  val q142 = Q(
    "q142_hll_overlap",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").select($"event_type", $"user_id")
      val regs = Hll.registers(ev, Seq("event_type"), "user_id")
      val singles = Hll.estimate(regs, Seq("event_type"))
        .select($"event_type", $"est_distinct")
      val types = ev.select($"event_type").distinct()
      val pairs = types.toDF("ta").crossJoin(types.toDF("tb"))
        .filter($"ta" < $"tb")
      val pairRegs = pairs
        .join(regs, col("event_type") === $"ta" ||
          col("event_type") === $"tb")
        .groupBy($"ta", $"tb", $"bucket").agg(max($"r").as("r"))
      val unions = Hll.estimate(pairRegs, Seq("ta", "tb"))
        .select($"ta", $"tb", $"est_distinct".as("est_union"))
      val du = ev.distinct()
      val exact = du.toDF("eta", "u")
        .join(du.toDF("etb", "u2"), $"u" === $"u2" && $"eta" < $"etb")
        .groupBy($"eta".as("ta"), $"etb".as("tb"))
        .agg(count(lit(1)).as("n_exact"))
      unions
        .join(singles.toDF("ta", "est_a"), "ta")
        .join(singles.toDF("tb", "est_b"), "tb")
        .join(exact, Seq("ta", "tb"))
        .select($"ta", $"tb", $"est_a", $"est_b", $"est_union",
          (round($"est_a" + $"est_b" - $"est_union", 6) + lit(0.0))
            .as("est_intersection"),
          $"n_exact")
        .orderBy($"ta", $"tb")
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               ${DuckOracle.mix(
                 "(CAST(user_id AS UHUGEINT) + 11400714819323198485::UHUGEINT)"
                 + " % 18446744073709551616::UHUGEINT")} AS hu
        FROM events
      ), rr AS (
        SELECT event_type,
               CAST(hu >> 54 AS BIGINT) AS bucket,
               CASE WHEN hu % 18014398509481984::UHUGEINT = 0 THEN 55
                    ELSE 55 - length(bin(CAST(hu % 18014398509481984::UHUGEINT
                      AS BIGINT))) END AS rho
        FROM h
      ), reg AS (
        SELECT event_type, bucket, max(rho) AS r FROM rr GROUP BY 1, 2
      ), sfin AS (
        SELECT event_type,
               CAST(1024 - count(*) AS BIGINT) AS zeros,
               CAST(sum(CASE WHEN r <= 40
                      THEN (CAST(1 AS BIGINT) << (40 - r)) ELSE 0 END)
                    + (1024 - count(*)) * 1099511627776 AS BIGINT)
                 AS z_scaled
        FROM reg GROUP BY 1
      ), sest AS (
        SELECT event_type, ${hllEstSql("sfin")} AS est FROM sfin
      ), pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM (SELECT DISTINCT event_type FROM events) a,
             (SELECT DISTINCT event_type FROM events) b
        WHERE a.event_type < b.event_type
      ), preg AS (
        SELECT p.ta, p.tb, r.bucket, max(r.r) AS r
        FROM pairs p JOIN reg r
          ON r.event_type = p.ta OR r.event_type = p.tb
        GROUP BY 1, 2, 3
      ), pfin AS (
        SELECT ta, tb,
               CAST(1024 - count(*) AS BIGINT) AS zeros,
               CAST(sum(CASE WHEN r <= 40
                      THEN (CAST(1 AS BIGINT) << (40 - r)) ELSE 0 END)
                    + (1024 - count(*)) * 1099511627776 AS BIGINT)
                 AS z_scaled
        FROM preg GROUP BY 1, 2
      ), pest AS (
        SELECT ta, tb, ${hllEstSql("pfin")} AS est_union FROM pfin
      ), du AS (
        SELECT DISTINCT event_type, user_id FROM events
      ), ex AS (
        SELECT x.event_type AS ta, y.event_type AS tb,
               CAST(count(*) AS BIGINT) AS n_exact
        FROM du x JOIN du y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2
      )
      SELECT u.ta, u.tb, sa.est AS est_a, sb.est AS est_b, u.est_union,
             round(sa.est + sb.est - u.est_union, 6) + 0.0
               AS est_intersection,
             ex.n_exact
      FROM pest u
      JOIN sest sa ON sa.event_type = u.ta
      JOIN sest sb ON sb.event_type = u.tb
      JOIN ex ON ex.ta = u.ta AND ex.tb = u.tb
      ORDER BY u.ta, u.tb"""))

  /** Semi-structured property extraction — the landing-zone shape every
    * event pipeline hits: a JSON `props` string column parsed row-locally
    * (`get_json_object`, codegen'd — no UDF, no schema inference pass
    * over the corpus) with malformed payloads surfacing as NULL instead
    * of failing the batch (planted here on every 97th event), then a
    * grouped rollup of the extracted value. `n_null_k` counts NULL
    * extractions — malformed JSON and valid JSON lacking `$.k` alike
    * (named for what it measures; a malformed-only census would need a
    * validity predicate, which `get_json_object` does not expose
    * separately from extraction). The oracle replays the extraction
    * with DuckDB's native JSON functions (`json_valid` +
    * `json_extract`) — two independent JSON parsers agreeing on both
    * the values and the NULL census. All-integer output. */
  val q158 = Q(
    "q158_json_props",
    (s, d) => {
      import s.implicits._
      val parsed = t(s, d, "events").select($"event_type",
        get_json_object(
          when($"event_id" % 97 === 0, lit("not json"))
            .otherwise($"props"), "$.k").cast("long").as("k"))
      parsed.groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"k".isNull, 1L).otherwise(0L)).as("n_null_k"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      WITH e AS (
        SELECT event_type,
               CASE WHEN event_id % 97 = 0 THEN 'not json'
                    ELSE props END AS raw
        FROM events
      ), p AS (
        SELECT event_type,
               CASE WHEN json_valid(raw)
                 THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
        FROM e
      )
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_k,
             CAST(sum(k) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM p GROUP BY 1 ORDER BY 1"""))

  /** Population-stability-index drift monitor — the distribution-shift
    * gate a training-data pipeline runs per slice before folding a new
    * time window into the corpus (PSI is the standard credit-scoring
    * drift metric: Σ (p−q)·ln(p/q) over buckets, >0.1 = investigate,
    * >0.25 = act). Per event_type, `value` is bucketed with the
    * integer-exact [[graft.operators.QuantileHist]] index (floor to
    * integer first — DuckDB CAST rounds where Spark truncates, floor is
    * exact in both), the stream splits at the integer midpoint of the
    * event-time span, and Laplace smoothing ((cnt+1)/(n+B), B = the
    * type's bucket count) keeps every log finite. Counts, buckets and
    * the split are all integers, so the only float is the final PSI —
    * emitted through the emit6 rounding boundary like every float
    * aggregate. Scale: one (type, bucket) count shuffle with map-side
    * combine; totals are a tiny broadcast back — the data is never
    * sorted and per-type state is the ≤2k-bucket sketch. */
  val q168 = Q(
    "q168_psi_drift",
    (s, d) => {
      import s.implicits._
      import graft.operators.QuantileHist
      val ev = t(s, d, "events")
      val mm = ev.agg(min(unix_micros($"ts")).as("lo"),
        max(unix_micros($"ts")).as("hi"))
      val halves = ev.crossJoin(broadcast(mm)).select($"event_type",
        QuantileHist.bucketIdx(floor($"value")).as("bucket"),
        when(unix_micros($"ts") < expr("lo + (hi - lo) div 2"), 1L)
          .otherwise(0L).as("fh"))
      val c = halves.groupBy($"event_type", $"bucket")
        .agg(sum($"fh").as("cf"), sum(lit(1L) - $"fh").as("cs"))
      val tot = c.groupBy($"event_type")
        .agg(sum($"cf").as("n_first"), sum($"cs").as("n_second"),
          count(lit(1)).as("n_buckets"))
      val p = ($"cf" + 1.0) / ($"n_first" + $"n_buckets")
      val q = ($"cs" + 1.0) / ($"n_second" + $"n_buckets")
      c.join(broadcast(tot), Seq("event_type"))
        .groupBy($"event_type", $"n_first", $"n_second", $"n_buckets")
        .agg(DomainQ.emit6(sum((p - q) * log(p / q))).as("psi"))
        .select($"event_type", $"n_first", $"n_second", $"n_buckets",
          $"psi", ($"psi" > 0.1).as("drifted"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH mm AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
      ), e AS (
        SELECT event_type,
               ${graft.operators.QuantileHist.bucketIdxSql(
                 "CAST(floor(value) AS BIGINT)")} AS bucket,
               CASE WHEN epoch_us(ts) < mm.lo + (mm.hi - mm.lo) // 2
                    THEN 1 ELSE 0 END AS fh
        FROM events CROSS JOIN mm
      ), c AS (
        SELECT event_type, bucket,
               CAST(sum(fh) AS BIGINT) AS cf,
               CAST(sum(1 - fh) AS BIGINT) AS cs
        FROM e GROUP BY 1, 2
      ), t AS (
        SELECT event_type, CAST(sum(cf) AS BIGINT) AS n_first,
               CAST(sum(cs) AS BIGINT) AS n_second,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM c GROUP BY 1
      )
      SELECT c.event_type, t.n_first, t.n_second, t.n_buckets,
             round(sum(
               ((c.cf + 1.0) / (t.n_first + t.n_buckets)
                 - (c.cs + 1.0) / (t.n_second + t.n_buckets))
               * ln(((c.cf + 1.0) / (t.n_first + t.n_buckets))
                    / ((c.cs + 1.0) / (t.n_second + t.n_buckets)))),
               6) + 0.0 AS psi,
             round(sum(
               ((c.cf + 1.0) / (t.n_first + t.n_buckets)
                 - (c.cs + 1.0) / (t.n_second + t.n_buckets))
               * ln(((c.cf + 1.0) / (t.n_first + t.n_buckets))
                    / ((c.cs + 1.0) / (t.n_second + t.n_buckets)))),
               6) + 0.0 > 0.1 AS drifted
      FROM c JOIN t USING (event_type)
      GROUP BY c.event_type, t.n_first, t.n_second, t.n_buckets
      ORDER BY c.event_type"""))

  /** Temporal embargo split
    * ([[graft.operators.Curation.temporalEmbargoSplit]]) — the
    * time-ordered leakage-prevention discipline beside the hash split
    * (q54) and the similarity-component split (q148): test events come
    * strictly after training events with a 6-hour embargo gap dropped
    * between them, so windowed features/labels straddling the boundary
    * cannot leak the future into training. The boundary is integer
    * microseconds over the observed span (deterministic at any
    * partitioning); the census emits per-(type, split) counts plus
    * min/max event micros, which hash-check the boundary discipline
    * itself — every train max_us ≤ boundary < embargo ≤ test min_us.
    * The fixture PLANTS null timestamps (every 97th event id) so the
    * `unknown` label — rows a real feed always contains, which must
    * not silently default into `test` — is hash-gated, not just
    * unit-asserted; per-split min/max coalesce to −1 so the census
    * stays BIGINT on both engines. Row-local after a one-row min/max
    * broadcast; zero data shuffles beyond the census aggregate. */
  val q175 = Q(
    "q175_temporal_embargo_split",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").withColumn("ts",
        when($"event_id" % 97 === 0, lit(null).cast("timestamp"))
          .otherwise($"ts"))
      graft.operators.Curation.temporalEmbargoSplit(
          ev, $"ts",
          trainPct = 80, embargoUs = 21600000000L)
        .groupBy($"event_type", $"split")
        .agg(count(lit(1)).as("n"),
          coalesce(min(unix_micros($"ts")), lit(-1L)).as("min_us"),
          coalesce(max(unix_micros($"ts")), lit(-1L)).as("max_us"))
        .orderBy($"event_type", $"split")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               CASE WHEN event_id % 97 = 0 THEN NULL
                    ELSE epoch_us(ts) END AS us
        FROM events
      ), mm AS (
        SELECT min(us) AS lo, max(us) AS hi FROM ev
      ), lab AS (
        SELECT event_type, us,
               CASE WHEN us IS NULL THEN 'unknown'
                    WHEN us <= mm.lo + (mm.hi - mm.lo) * 80 // 100
                    THEN 'train'
                    WHEN us <= mm.lo + (mm.hi - mm.lo) * 80 // 100
                         + 21600000000
                    THEN 'embargo'
                    ELSE 'test' END AS split
        FROM ev CROSS JOIN mm
      )
      SELECT event_type, split, CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(min(us), -1) AS BIGINT) AS min_us,
             CAST(coalesce(max(us), -1) AS BIGINT) AS max_us
      FROM lab GROUP BY 1, 2
      ORDER BY event_type, split"""))

  val all: Seq[Q] =
    Seq(q43, q46, q97, q100, q109, q110, q115, q116, q117, q119, q120,
      q129, q131, q134, q140, q142, q158, q168, q175)
}
