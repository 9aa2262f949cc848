package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window operators (SURVEY.md §2.7): lead/lag neighbor ops, sessionization
  * (gaps-and-islands — the reference's DMR segment-id assignment,
  * dm.py:591-594), running aggregates, per-group top-k, and the BH/FDR
  * p-value adjustment (dm.py:475-477) as a pure two-window plan.
  *
  * Scale: windows shuffle once on their partition key; ORDER BY inside a
  * partition sorts locally. Partition keys chosen with high cardinality
  * (supplier, user, customer) so no single partition concentrates data.
  */
object Windows {

  /** W1/W2: lead() neighbor difference over an ordered partition —
    * the reference's next-probe distance (dm.py:569-575). Window order
    * includes unique tiebreak keys so results are deterministic. */
  val q15 = Q(
    "q15_window_lead_gap",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      t(s, d, "lineitem")
        .withColumn("next_ship", lead($"l_shipdate", 1).over(w))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          datediff(to_date($"next_ship"), to_date($"l_shipdate"))
            .cast("long").as("gap_days"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             date_diff('day', CAST(l_shipdate AS DATE),
                       CAST(lead(l_shipdate, 1) OVER w AS DATE)) AS gap_days
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** W3: sessionization (gaps-and-islands). Flag a new session when the
    * gap to the previous event exceeds 30 min, running-sum the flags into
    * session ids, then summarize per user. Exactly the reference's
    * change-point → cumsum → segment-id pattern (dm.py:591-594).
    * Comparison in exact integer microseconds (no float drift). */
  val q16 = Q(
    "q16_sessionize",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_s",
          when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"new_s").over(wRun))
        .groupBy($"user_id")
        .agg(max($"session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, ts,
               epoch_us(ts) AS us,
               lag(epoch_us(ts), 1) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
      ), g AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM f
      )
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM g
      GROUP BY user_id
      ORDER BY user_id"""))

  /** W3 (running form): cumulative sum over an ordered partition. Values
    * sit on the 0.01 decimal grid so round(2) absorbs accumulation-order
    * differences between engines. */
  val q17 = Q(
    "q17_running_sum",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("running_spend"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  /** W6/T2: per-group top-k via row_number (reference's rank-based
    * selections; TakeOrderedAndProject shape for the global variant). */
  val q18 = Q(
    "q18_topk_per_group",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  /** W7/L3: Benjamini-Hochberg FDR adjustment (dm.py:475-477) via
    * Ranks.bhAdjust — the distributed rank + suffix-min scan, no
    * single-partition window. Pseudo p-values derived deterministically
    * from the key; all arithmetic is order-fixed IEEE so no rounding is
    * needed. */
  val q19 = Q(
    "q19_bh_adjust",
    (s, d) => {
      import s.implicits._
      val base = t(s, d, "orders")
        .select($"o_orderkey",
          ((($"o_orderkey" * 7919) % 10000 + 1) / lit(10001.0)).as("p"))
      graft.operators.Ranks
        .bhAdjust(base, "p", "p_adj", tieCols = Seq($"o_orderkey"))
        .select($"o_orderkey", $"p", $"p_adj")
        .orderBy($"o_orderkey")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey,
               ((o_orderkey * 7919) % 10000 + 1) / 10001.0 AS p
        FROM orders
      ), ranked AS (
        SELECT o_orderkey, p,
               count(*) OVER () AS n,
               row_number() OVER (ORDER BY p, o_orderkey) AS rnk
        FROM base
      )
      SELECT o_orderkey, p,
             least(min((p * n) / rnk) OVER (ORDER BY rnk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS p_adj
      FROM ranked
      ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(q15, q16, q17, q18, q19)
}
