package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.2 filters, §2.4 joins, §2.5
  * reshape, §2.6 aggregations, §2.9 set ops) expressed over the driver's
  * TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Determinism rules (see [[graft.Q]]): total ORDER BY; identical aliases;
  * float aggregates rounded at (or above) the decimal grain of the true
  * value so accumulation-order drift cannot flip the driver's hash.
  *
  * Scale notes (100 TB): every query here is a single declarative plan —
  * filters/projections push into the parquet scan, dimension joins are
  * explicit `broadcast()`, aggregations are partial (map-side combine)
  * before the single hash shuffle. No collect-to-driver anywhere.
  */
object Relational {

  /** A1/A6/A8-style grouped aggregation (TPC-H Q1 shape). Maps the
    * reference's per-sample intensity summaries (samples.py:1017-1072). */
  val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 6).as("avg_qty"),
          round(avg($"l_extendedprice"), 6).as("avg_price"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** F1-F6: predicate + projection; both push into the parquet scan
    * (verify `PushedFilters`/`ReadSchema` in explain). */
  val q02 = Q(
    "q02_filter_project",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01") &&
          $"l_shipdate" < lit("1997-01-01") &&
          $"l_quantity" < 24 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity < 24 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber"""))

  /** F7: membership filter (reference `get_probes` by id list,
    * samples.py:390-414). */
  val q03 = Q(
    "q03_filter_in",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .filter($"p_size".isin(1, 5, 9, 15, 23) &&
          $"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey, p_brand, p_type, p_size
      FROM part
      WHERE p_size IN (1, 5, 9, 15, 23)
        AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      ORDER BY p_partkey"""))

  /** F8: regex predicate (reference `controls` probe-id regex,
    * samples.py:837-869 — case-insensitive rlike). */
  val q04 = Q(
    "q04_filter_regex",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .filter($"p_name".rlike("(?i)(red|blue).*(bolt|gear)"))
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name
      FROM part
      WHERE regexp_matches(p_name, '(?i)(red|blue).*(bolt|gear)')
      ORDER BY p_partkey"""))

  /** J1: fact × small-dimension broadcast hash join + grouped agg (the
    * reference's IDAT × manifest join, samples.py:525-528). `broadcast()`
    * keeps it shuffle-free on the fact side at any scale. */
  val q05 = Q(
    "q05_join_broadcast_agg",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy($"p_brand")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },
    Some("""
      SELECT p_brand,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** J2/J3: multiway star join through two dimension hops, all
    * broadcastable (region/nation/customer are tiny dims). */
  val q06 = Q(
    "q06_join_multiway",
    (s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(
          round(sum($"o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""
      SELECT r_name, n_name,
             round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  /** J9: left-semi join (EXISTS) — reference sheet × signal sample
    * intersection (samples.py:83-88). */
  val q07 = Q(
    "q07_semi_join",
    (s, d) => {
      import s.implicits._
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter($"o_totalprice" > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      ORDER BY c_custkey"""))

  /** U3/M-ops: left-anti join (NOT EXISTS) — the mask-removal pattern. */
  val q08 = Q(
    "q08_anti_join",
    (s, d) => {
      import s.implicits._
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter($"o_totalprice" > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)
      ORDER BY c_custkey"""))

  /** U1: unionByName of tagged subsets (reference oob ∪ ib concat,
    * samples.py:172,256). */
  val q09 = Q(
    "q09_union_all",
    (s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
      val hi = o.filter($"o_totalprice" > 250000)
        .select($"o_orderkey", lit("hi").as("bucket"))
      val lo = o.filter($"o_totalprice" < 10000)
        .select($"o_orderkey", lit("lo").as("bucket"))
      hi.unionByName(lo).orderBy($"o_orderkey", $"bucket")
    },
    Some("""
      SELECT o_orderkey, 'hi' AS bucket FROM orders WHERE o_totalprice > 250000
      UNION ALL
      SELECT o_orderkey, 'lo' AS bucket FROM orders WHERE o_totalprice < 10000
      ORDER BY o_orderkey, bucket"""))

  /** U2: intersection on a key column (reference betas ∩ dmp probes,
    * dm.py:543-546). */
  val q10 = Q(
    "q10_intersect",
    (s, d) => {
      import s.implicits._
      val a = t(s, d, "lineitem").select($"l_partkey".as("k"))
      val b = t(s, d, "part").filter($"p_size" > 25).select($"p_partkey".as("k"))
      a.intersect(b).orderBy($"k")
    },
    Some("""
      SELECT l_partkey AS k FROM lineitem
      INTERSECT
      SELECT p_partkey AS k FROM part WHERE p_size > 25
      ORDER BY k"""))

  /** U3: difference (reference available − normalization samples,
    * cnv.py:75). */
  val q11 = Q(
    "q11_except",
    (s, d) => {
      import s.implicits._
      val a = t(s, d, "part").select($"p_partkey".as("k"))
      val b = t(s, d, "lineitem").filter($"l_quantity" >= 48)
        .select($"l_partkey".as("k"))
      a.except(b).orderBy($"k")
    },
    Some("""
      SELECT p_partkey AS k FROM part
      EXCEPT
      SELECT l_partkey AS k FROM lineitem WHERE l_quantity >= 48
      ORDER BY k"""))

  /** U4: dropDuplicates (reference drop_duplicates, samples.py:526). */
  val q12 = Q(
    "q12_distinct",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .select($"c_mktsegment", $"c_nationkey")
        .dropDuplicates()
        .orderBy($"c_mktsegment", $"c_nationkey")
    },
    Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey
      FROM customer
      ORDER BY c_mktsegment, c_nationkey"""))

  /** R1: pivot via conditional aggregation — the faster pattern chosen for
    * the reference's signal pivot (samples.py:537-554): no `pivot()` probe
    * pass, stays in one partial-agg shuffle. */
  val q13 = Q(
    "q13_pivot_conditional",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(sum(when($"l_linestatus" === "F", $"l_quantity")
            .otherwise(0.0)), 2).as("qty_f"),
          round(sum(when($"l_linestatus" === "O", $"l_quantity")
            .otherwise(0.0)), 2).as("qty_o"),
          sum(when($"l_linestatus" === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when($"l_linestatus" === "O", 1L).otherwise(0L)).as("n_o"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END), 2) AS qty_f,
             round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 2) AS qty_o,
             CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** R3: explode a delimited string column (reference `';'`-separated
    * genes/cgi explode, visualizations.py:1902-1903). */
  val q14 = Q(
    "q14_explode_split",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select(explode(split($"p_type", " ")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"word")
    },
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
      GROUP BY word
      ORDER BY word"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14)
}
