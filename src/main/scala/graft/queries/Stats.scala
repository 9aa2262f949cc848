package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.functions._

/** Statistical aggregations (SURVEY.md §2.6): exact quantiles/IQR
  * (stats.py:13-26), correlation (visualizations.py:2198), the
  * type-dispatch merge aggregation (utils.py:533-564), global top-k, and
  * the scalar-function family (§2.10) incl. the chromosome-normalization
  * when-chain (utils.py:308-354).
  */
object Stats {

  /** A15/A16: exact linearly-interpolated quantiles + IQR per group.
    * `percentile` is exact (per-group sort) — right for the reference's
    * small per-(sample,channel) groups; the 100 TB path swaps in
    * `percentile_approx` where documented approximation is acceptable. */
  val q20 = Q(
    "q20_quantiles_iqr",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(percentile($"l_extendedprice", lit(0.25)), 4).as("p25"),
          round(percentile($"l_extendedprice", lit(0.5)), 4).as("p50"),
          round(percentile($"l_extendedprice", lit(0.75)), 4).as("p75"),
          round(percentile($"l_extendedprice", lit(0.75)) -
            percentile($"l_extendedprice", lit(0.25)), 4).as("iqr"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             round(quantile_cont(l_extendedprice, 0.75)
                   - quantile_cont(l_extendedprice, 0.25), 4) AS iqr
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** A21: Pearson correlation + dispersion per group
    * (reference metadata correlation matrix, visualizations.py:2198). */
  val q21 = Q(
    "q21_corr_stddev",
    (s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
          round(stddev_samp($"l_discount"), 6).as("sd_disc"),
          round(var_samp($"l_quantity"), 6).as("var_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             round(stddev_samp(l_discount), 6) AS sd_disc,
             round(var_samp(l_quantity), 6) AS var_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** A4: the reference's type-dispatch merge aggregation
    * (utils.py:533-564): strings → sorted ';'-join of uniques, numeric →
    * mean, boolean → any. */
  val q22 = Q(
    "q22_merge_series",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .groupBy($"c_nationkey")
        .agg(
          concat_ws(";", sort_array(collect_set($"c_mktsegment")))
            .as("segments"),
          round(avg($"c_acctbal"), 6).as("mean_bal"),
          expr("bool_or(c_acctbal > 5000)").as("any_rich"),
          count(lit(1)).as("n"))
        .orderBy($"c_nationkey")
    },
    Some("""
      SELECT c_nationkey,
             coalesce(string_agg(DISTINCT c_mktsegment, ';'
                                 ORDER BY c_mktsegment), '') AS segments,
             round(avg(c_acctbal), 6) AS mean_bal,
             bool_or(c_acctbal > 5000) AS any_rich,
             count(*) AS n
      FROM customer
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""))

  /** T2/T3: global top-k → TakeOrderedAndProject (no full sort at scale);
    * the reference's nlargest(20) (samples.py:1375-1376). */
  val q23 = Q(
    "q23_topk_global",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderkey", $"o_totalprice",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    },
    Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20"""))

  /** §2.10 scalar functions: string ops + the chromosome-normalization
    * style when-chain (utils.py:308-354: X→98, Y→99, other→100). */
  val q24 = Q(
    "q24_scalar_functions",
    (s, d) => {
      import s.implicits._
      t(s, d, "part")
        .select(
          $"p_partkey",
          lower($"p_name").as("name_lower"),
          substring($"p_type", 1, 8).as("type_prefix"),
          regexp_replace($"p_brand", "[^0-9]", "").as("brand_num"),
          length($"p_name").cast("long").as("name_len"),
          when($"p_size" < 10, "S")
            .when($"p_size" < 30, "M")
            .when($"p_size" < 45, "L")
            .otherwise("XL").as("size_class"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
             lower(p_name) AS name_lower,
             substr(p_type, 1, 8) AS type_prefix,
             regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
             length(p_name) AS name_len,
             CASE WHEN p_size < 10 THEN 'S'
                  WHEN p_size < 30 THEN 'M'
                  WHEN p_size < 45 THEN 'L'
                  ELSE 'XL' END AS size_class,
             concat_ws('|', p_brand, p_type) AS brand_type
      FROM part
      ORDER BY p_partkey"""))

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24)
}
