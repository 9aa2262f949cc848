package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additional §2 mappings: fixed-width histograms (the KDE-feeding tables
  * of L22/A11, qc.QC.betaHistogram pattern) and ntile decile ranking
  * (W6 rank family).
  */
object ExtraQ {

  /** L22/A11 — fixed-width histogram per group: integer bucket ids from
    * division (exact both sides), counts + per-bucket means. */
  val q39 = Q(
    "q39_histogram",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .withColumn("bucket",
          floor($"l_extendedprice" / 10000.0).cast("long"))
        .groupBy($"l_returnflag", $"bucket")
        .agg(count(lit(1)).as("n"),
          round(avg($"l_quantity"), 6).as("mean_qty"))
        .orderBy($"l_returnflag", $"bucket")
    },
    Some("""
      SELECT l_returnflag,
             CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
             count(*) AS n,
             round(avg(l_quantity), 6) AS mean_qty
      FROM lineitem
      GROUP BY l_returnflag, bucket
      ORDER BY l_returnflag, bucket"""))

  /** W6 — ntile decile over a total order (unique tiebreak makes the
    * bucket assignment deterministic and identical across engines),
    * computed by Ranks.withNtile: distributed global rank + bucket
    * arithmetic instead of a single-partition window. */
  val q40 = Q(
    "q40_ntile_deciles",
    (s, d) => {
      import s.implicits._
      graft.operators.Ranks.withNtile(t(s, d, "orders"), 10,
          Seq($"o_totalprice", $"o_orderkey"), "decile")
        .groupBy($"decile")
        .agg(count(lit(1)).as("n"),
          round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"decile")
    },
    Some("""
      SELECT decile, count(*) AS n,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
      FROM (SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                     AS decile
            FROM orders)
      GROUP BY decile
      ORDER BY decile"""))

  /** Multi-level aggregation: ROLLUP over (returnflag, linestatus) —
    * subtotals and a grand total in one pass (Catalyst expands the
    * grouping sets map-side; still a single shuffle). NULL grouping
    * cells are coalesced to 'ALL' on both sides (the driver-generated
    * columns are non-null, so the sentinel is unambiguous). */
  val q45 = Q(
    "q45_rollup",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_quantity"), 2).as("sum_qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"n", $"sum_qty")
        .orderBy($"rf", $"ls")
    },
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))

  /** R2 — unpivot/melt to long form (the reference's pd.melt,
    * visualizations.py:2117): three measure columns become (metric, v)
    * rows via the native unpivot operator (an Expand node — no shuffle
    * at all until the final presentation sort). */
  val q47 = Q(
    "q47_unpivot",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" % 100 === 0)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "metric", "v")
        .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
          $"metric", round($"v", 2).as("v"))
        .orderBy($"l_orderkey", $"line_no", $"metric", $"v")
    },
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
             metric, round(v, 2) AS v
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS v FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, line_no, metric, v"""))

  /** A18 — the distributed sort-merge ECDF lookup (operators.Ecdf, the
    * pOOBAH scale path) against a correlated-count oracle: F(v) =
    * #(background ≤ v)/n per group, right-continuous. count/n is an
    * integer ratio in double — bit-identical across engines, so no
    * rounding is needed. */
  val q48 = Q(
    "q48_ecdf_lookup",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val queries = li.filter($"l_orderkey" % 500 === 0)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
          $"l_returnflag", $"l_extendedprice")
      graft.operators.Ecdf.ecdfLookup(queries,
          li.select($"l_returnflag", $"l_extendedprice"),
          Seq("l_returnflag"), "l_extendedprice", "ecdf")
        .select($"l_orderkey", $"line_no", $"l_returnflag", $"ecdf")
        .orderBy($"l_orderkey", $"line_no", $"l_returnflag", $"ecdf")
    },
    Some("""
      WITH q AS (
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
               l_returnflag, l_extendedprice
        FROM lineitem WHERE l_orderkey % 500 = 0
      ), n AS (
        SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1
      )
      SELECT q.l_orderkey, q.line_no, q.l_returnflag,
             CAST((SELECT count(*) FROM lineitem b
                   WHERE b.l_returnflag = q.l_returnflag
                     AND b.l_extendedprice <= q.l_extendedprice) AS DOUBLE)
               / n.n AS ecdf
      FROM q JOIN n ON n.l_returnflag = q.l_returnflag
      ORDER BY q.l_orderkey, q.line_no, q.l_returnflag, ecdf"""))

  /** L14/np.interp — the distributed sort-merge piecewise-linear
    * interpolation (operators.Interp, the dye-bias-NL scale path)
    * against a bracketing-knot oracle. Knots are a deterministic curve
    * per returnflag (bucket-grid x, rounded mean-quantity y); the blend
    * is ONE arithmetic expression evaluated on identical doubles both
    * sides, so no output rounding is needed. */
  val q49 = Q(
    "q49_interp_lookup",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val knots = li
        .groupBy($"l_returnflag",
          (floor($"l_extendedprice" / 10000.0) * 10000.0).as("xp"))
        .agg(round(avg($"l_quantity"), 6).as("fp"))
      val queries = li.filter($"l_orderkey" % 777 === 0)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
          $"l_returnflag", $"l_extendedprice")
      graft.operators.Interp.interpLookup(queries, knots,
          Seq("l_returnflag"), "l_extendedprice", "y")
        .select($"l_orderkey", $"line_no", $"l_returnflag", $"y")
        .orderBy($"l_orderkey", $"line_no", $"l_returnflag", $"y")
    },
    Some("""
      WITH k AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice / 10000.0) * 10000.0 AS DOUBLE)
                 AS xp,
               round(avg(l_quantity), 6) AS fp
        FROM lineitem GROUP BY 1, 2
      ), q AS (
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
               l_returnflag, l_extendedprice AS x
        FROM lineitem WHERE l_orderkey % 777 = 0
      ), lo AS (
        SELECT q.l_returnflag, q.x, max(k.xp) AS lx,
               arg_max(k.fp, k.xp) AS ly
        FROM (SELECT DISTINCT l_returnflag, x FROM q) q
        JOIN k ON k.l_returnflag = q.l_returnflag AND k.xp <= q.x
        GROUP BY 1, 2
      ), hi AS (
        SELECT q.l_returnflag, q.x, min(k.xp) AS hx,
               arg_min(k.fp, k.xp) AS hy
        FROM (SELECT DISTINCT l_returnflag, x FROM q) q
        JOIN k ON k.l_returnflag = q.l_returnflag AND k.xp > q.x
        GROUP BY 1, 2
      )
      SELECT q.l_orderkey, q.line_no, q.l_returnflag,
             CASE WHEN lo.lx IS NULL AND hi.hx IS NULL THEN NULL
                  WHEN lo.lx IS NULL THEN hi.hy
                  WHEN hi.hx IS NULL THEN lo.ly
                  ELSE lo.ly + (hi.hy - lo.ly) * (q.x - lo.lx)
                               / (hi.hx - lo.lx)
             END AS y
      FROM q
      LEFT JOIN lo ON lo.l_returnflag = q.l_returnflag AND lo.x = q.x
      LEFT JOIN hi ON hi.l_returnflag = q.l_returnflag AND hi.x = q.x
      ORDER BY q.l_orderkey, q.line_no, q.l_returnflag, y"""))

  val all: Seq[Q] = Seq(q39, q40, q45, q47, q48, q49)
}
