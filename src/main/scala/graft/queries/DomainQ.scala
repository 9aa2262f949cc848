package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.functions._

/** Domain end-to-end oracles converting the remaining spec-only §2 blocks
  * into hash-gated rows: linear dye bias (L13), CNV bin medians (L7),
  * per-probe OLS (L1), dye-bias QC summary (A9) and beta-state
  * proportions (A11). Same discipline as q57-q59: a signal-shaped frame
  * is derived from the driver tables with INTEGER-VALUED cells (sums and
  * medians are then exact rationals on both engines, so the only
  * engine-visible rounding is the final float cast / round), and the
  * DuckDB oracle replays the full operator formula.
  */
object DomainQ {

  /** L13 end-to-end — dyeBiasCorrectionL (Prep.scala:233, reference
    * samples.py:1300-1338): scale G cells by mean_ib/median(type-I
    * in-band G), R cells by mean_ib/median(type-I in-band R). The frame
    * covers type II, type I G and type I R regimes plus per-cell NULLs
    * (scaled NULL stays NULL). All cells are integer-valued so mean_ib
    * and the medians are exact on both engines; the output is
    * FLOAT-exact (same double product, same final cast). */
  val q65 = Q(
    "q65_dyebias_linear_endtoend",
    (s, d) => {
      import s.implicits._
      def cell(base: org.apache.spark.sql.Column, m: Int) =
        when($"l_orderkey" % 23 === 0 || $"l_orderkey" % m === 0,
          lit(null).cast("float")).otherwise(base.cast("float"))
      val sig = t(s, d, "lineitem").select(
        $"l_suppkey".cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_partkey" % 3 === 0, "II").otherwise("I").as("inf_type"),
        when($"l_partkey" % 2 === 0, "G").otherwise("R").as("channel"),
        cell($"l_quantity", 11).as("meth_g"),
        cell(($"l_orderkey" * 3 + $"l_linenumber") % 47, 13)
          .as("unmeth_g"),
        cell(($"l_orderkey" * 7 + $"l_linenumber") % 53, 17)
          .as("meth_r"),
        cell(($"l_orderkey" * 11 + $"l_linenumber" * 5) % 59, 19)
          .as("unmeth_r"))
      graft.prep.Prep.dyeBiasCorrectionL(sig)
        .select($"sample_label", $"probe_id", $"inf_type", $"channel",
          $"meth_g", $"unmeth_g", $"meth_r", $"unmeth_r")
        .orderBy($"sample_label", $"probe_id", $"meth_g", $"unmeth_g",
          $"meth_r", $"unmeth_r")
    },
    Some("""
      WITH sig AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               CAST(l_partkey AS VARCHAR) AS probe_id,
               CASE WHEN l_partkey % 3 = 0 THEN 'II' ELSE 'I' END
                 AS inf_type,
               CASE WHEN l_partkey % 2 = 0 THEN 'G' ELSE 'R' END
                 AS channel,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 11 = 0
                    THEN NULL ELSE CAST(l_quantity AS FLOAT) END
                 AS meth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 3 + l_linenumber) % 47
                              AS FLOAT) END AS unmeth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 17 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 7 + l_linenumber) % 53
                              AS FLOAT) END AS meth_r,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 19 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 11 + l_linenumber * 5) % 59
                              AS FLOAT) END AS unmeth_r
        FROM lineitem
      ), ib AS (
        -- ibCells: two (channel, value) cells per row. Type II reads
        -- (G, meth_g) and (R, unmeth_r); type I reads both cells from
        -- its own channel.
        SELECT sample_label, inf_type, channel,
               CASE WHEN inf_type = 'II' THEN 'G' ELSE channel END AS ch,
               CASE WHEN inf_type = 'II' THEN meth_g
                    WHEN channel = 'G' THEN meth_g ELSE meth_r END AS v
        FROM sig
        UNION ALL
        SELECT sample_label, inf_type, channel,
               CASE WHEN inf_type = 'II' THEN 'R' ELSE channel END AS ch,
               CASE WHEN inf_type = 'II' THEN unmeth_r
                    WHEN channel = 'G' THEN unmeth_g ELSE unmeth_r END
                 AS v
        FROM sig
      ), mean_ib AS (
        SELECT sample_label, avg(CAST(v AS DOUBLE)) AS mean_ib
        FROM ib WHERE v IS NOT NULL GROUP BY sample_label
      ), med AS (
        SELECT sample_label,
               quantile_cont(CASE WHEN ch = 'G'
                 THEN CAST(v AS DOUBLE) END, 0.5) AS med_g,
               quantile_cont(CASE WHEN ch = 'R'
                 THEN CAST(v AS DOUBLE) END, 0.5) AS med_r
        FROM ib WHERE inf_type = 'I' AND v IS NOT NULL
        GROUP BY sample_label
      ), f AS (
        SELECT m.sample_label, m.mean_ib / d.med_g AS f_g,
               m.mean_ib / d.med_r AS f_r
        FROM mean_ib m JOIN med d USING (sample_label)
      )
      SELECT s.sample_label, s.probe_id, s.inf_type, s.channel,
             CAST(s.meth_g * f.f_g AS FLOAT) AS meth_g,
             CAST(s.unmeth_g * f.f_g AS FLOAT) AS unmeth_g,
             CAST(s.meth_r * f.f_r AS FLOAT) AS meth_r,
             CAST(s.unmeth_r * f.f_r AS FLOAT) AS unmeth_r
      FROM sig s LEFT JOIN f USING (sample_label)
      ORDER BY sample_label, probe_id, meth_g, unmeth_g, meth_r,
               unmeth_r"""))

  /** L7 end-to-end — Cnv.binMedians (Cnv.scala:230, reference
    * cnv.py:184-187): probe CNV signal joined onto its genomic range,
    * overlap-joined with fixed 50 kb bins, per-bin exact median +
    * probe count + bin midpoint. Probe ranges/values derive from part
    * (integer cnv → the median interpolation is exact). Bins come from
    * tileGenome over a 4-chromosome synthetic genome — the same
    * generator the CNV pipeline uses. */
  val q66 = Q(
    "q66_cnv_bin_medians",
    (s, d) => {
      import s.implicits._
      val ranges = t(s, d, "part").select(
        $"p_partkey".cast("string").as("probe_id"),
        concat(lit("chr"), ($"p_partkey" % 4 + 1).cast("string"))
          .as("chromosome"),
        (($"p_partkey" * 1543) % 1000000L).cast("long").as("start"),
        (($"p_partkey" * 1543) % 1000000L + 120L).cast("long").as("end"))
      val cnv = t(s, d, "part").select(
        $"p_partkey".cast("string").as("probe_id"),
        ($"p_partkey" % 97).cast("double").as("cnv"))
      val seqLens = ranges.select($"chromosome".as("chrom")).distinct()
        .withColumn("seq_length", lit(1000000L))
      val bins = graft.operators.Intervals.tileGenome(seqLens, 50000L)
      graft.cnv.Cnv.binMedians(cnv, ranges, bins)
        .select($"chrom", $"start_bin", $"end_bin",
          round($"cnv", 6).as("cnv"), $"n_probes", $"map_loc")
        .orderBy($"chrom", $"start_bin")
    },
    Some("""
      WITH ranges AS (
        SELECT CAST(p_partkey AS VARCHAR) AS probe_id,
               'chr' || CAST(p_partkey % 4 + 1 AS VARCHAR) AS chrom,
               CAST((p_partkey * 1543) % 1000000 AS BIGINT) AS r_start,
               CAST((p_partkey * 1543) % 1000000 + 120 AS BIGINT)
                 AS r_end,
               CAST(p_partkey % 97 AS DOUBLE) AS cnv
        FROM part
      ), bins AS (
        SELECT c.chrom, t.s AS start_bin,
               least(t.s + 50000, 1000000) AS end_bin
        FROM (SELECT DISTINCT chrom FROM ranges) c
        CROSS JOIN (SELECT UNNEST(generate_series(0, 999999, 50000))
                      AS s) t
      )
      SELECT b.chrom, b.start_bin, b.end_bin,
             round(quantile_cont(r.cnv, 0.5), 6) AS cnv,
             count(*) AS n_probes,
             CAST(floor((b.start_bin + b.end_bin) / 2) AS BIGINT)
               AS map_loc
      FROM ranges r
      JOIN bins b ON r.chrom = b.chrom
        AND r.r_start < b.end_bin AND r.r_end > b.start_bin
      GROUP BY b.chrom, b.start_bin, b.end_bin
      ORDER BY b.chrom, start_bin"""))

  /** L1 end-to-end — Dm.computeDmp (Dm.scala:76, reference
    * dm.py:458-477): per-probe OLS of beta ~ nation (intercept +
    * numeric covariate) with per-probe sample subsets (a probe only
    * fits over the samples that observed it — the reference's NA-drop
    * path). The oracle replays the closed-form simple regression:
    * slope, intercept, residual variance, and the (X'X)^-1 standard
    * errors. Probes seen in < 5 samples are excluded on both sides
    * (below p+1 the fit is NaN by contract; tiny subsets risk
    * degenerate zero-variance designs). p-values are Student-t /
    * F-distribution surface — covered by DmSpec, not SQL-expressible —
    * so the oracle gates estimates, standard errors and t-values. */
  val q67 = Q(
    "q67_dmp_ols_endtoend",
    (s, d) => {
      import s.implicits._
      val betasAll = t(s, d, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(avg($"l_quantity").as("beta"))
        .select($"l_suppkey".cast("string").as("sample_label"),
          $"l_partkey".cast("string").as("probe_id"), $"beta")
      val eligible = betasAll.groupBy("probe_id")
        .agg(count(lit(1)).as("n_obs")).filter($"n_obs" >= 5)
        .drop("n_obs")
      val betas = betasAll.join(eligible, "probe_id")
      val sheetRows = t(s, d, "supplier")
        .select($"s_suppkey".cast("string"),
          $"s_nationkey".cast("string"))
        .collect().map(r => Map(
          "sample_label" -> r.getString(0), "nation" -> r.getString(1)))
        .toSeq
      val design =
        graft.dm.Dm.designMatrix(sheetRows, "sample_label", "~ nation")
      graft.dm.Dm.computeDmp(s, betas, design)
        .select($"probe_id",
          round($"effect_size", 6).as("effect_size"),
          round($"Intercept_estimate", 6).as("intercept_estimate"),
          round($"Intercept_std_err", 6).as("intercept_std_err"),
          round($"Intercept_t_value", 6).as("intercept_t_value"),
          round($"nation_estimate", 6).as("nation_estimate"),
          round($"nation_std_err", 6).as("nation_std_err"),
          round($"nation_t_value", 6).as("nation_t_value"))
        .orderBy($"probe_id")
    },
    Some("""
      WITH betas AS (
        SELECT CAST(l_partkey AS VARCHAR) AS probe_id,
               CAST(l_suppkey AS VARCHAR) AS sample_label,
               avg(l_quantity) AS y
        FROM lineitem GROUP BY 1, 2
      ), eligible AS (
        SELECT probe_id FROM betas
        GROUP BY probe_id HAVING count(*) >= 5
      ), joined AS (
        SELECT b.probe_id, b.y, CAST(s.s_nationkey AS DOUBLE) AS x
        FROM betas b
        JOIN eligible e USING (probe_id)
        JOIN supplier s ON CAST(s.s_suppkey AS VARCHAR) = b.sample_label
      ), st AS (
        SELECT probe_id, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(x * x) AS sxx,
               sum(y) AS sy, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM joined GROUP BY probe_id
      ), fit AS (
        SELECT probe_id, n, sxx, sy, sxy, syy,
               n * sxx - sx * sx AS det, sx,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        FROM st
      ), fit2 AS (
        SELECT probe_id, n, sxx, det, slope,
               (sy - slope * sx) / n AS icept,
               greatest(syy - ((sy - slope * sx) / n) * sy
                        - slope * sxy, 0) / (n - 2) AS sigma2
        FROM fit
      )
      SELECT probe_id,
             round(abs(slope), 6) AS effect_size,
             round(icept, 6) AS intercept_estimate,
             round(sqrt(sigma2 * sxx / det), 6) AS intercept_std_err,
             round(icept / sqrt(sigma2 * sxx / det), 6)
               AS intercept_t_value,
             round(slope, 6) AS nation_estimate,
             round(sqrt(sigma2 * n / det), 6) AS nation_std_err,
             round(slope / sqrt(sigma2 * n / det), 6) AS nation_t_value
      FROM fit2
      ORDER BY probe_id"""))

  /** A9 end-to-end — QC.dyeBiasSummary (QC.scala:59, reference
    * samples.py:1372-1376, quality_control.py:193-207): per (sample,
    * channel) the median and the top-20 median of the type-I in-band
    * intensity. The oracle replays the top-20 slice with a row_number
    * window (ties carry identical values, so tie order cannot move
    * the median). Same integer-valued frame as q65. */
  val q68 = Q(
    "q68_dyebias_summary",
    (s, d) => {
      import s.implicits._
      def cell(base: org.apache.spark.sql.Column, m: Int) =
        when($"l_orderkey" % 23 === 0 || $"l_orderkey" % m === 0,
          lit(null).cast("float")).otherwise(base.cast("float"))
      val sig = t(s, d, "lineitem").select(
        $"l_suppkey".cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_partkey" % 3 === 0, "II").otherwise("I").as("inf_type"),
        when($"l_partkey" % 2 === 0, "G").otherwise("R").as("channel"),
        cell($"l_quantity", 11).as("meth_g"),
        cell(($"l_orderkey" * 3 + $"l_linenumber") % 47, 13)
          .as("unmeth_g"),
        cell(($"l_orderkey" * 7 + $"l_linenumber") % 53, 17)
          .as("meth_r"),
        cell(($"l_orderkey" * 11 + $"l_linenumber" * 5) % 59, 19)
          .as("unmeth_r"))
      graft.qc.QC.dyeBiasSummary(sig)
        .select($"sample_label", $"channel",
          round($"median_intensity", 6).as("median_intensity"),
          round($"top20_median", 6).as("top20_median"), $"n_values")
        .orderBy($"sample_label", $"channel")
    },
    Some("""
      WITH sig AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               CASE WHEN l_partkey % 3 = 0 THEN 'II' ELSE 'I' END
                 AS inf_type,
               CASE WHEN l_partkey % 2 = 0 THEN 'G' ELSE 'R' END
                 AS channel,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 11 = 0
                    THEN NULL ELSE CAST(l_quantity AS FLOAT) END
                 AS meth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 3 + l_linenumber) % 47
                              AS FLOAT) END AS unmeth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 17 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 7 + l_linenumber) % 53
                              AS FLOAT) END AS meth_r,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 19 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 11 + l_linenumber * 5) % 59
                              AS FLOAT) END AS unmeth_r
        FROM lineitem WHERE l_partkey % 3 <> 0
      ), ib AS (
        SELECT sample_label, channel,
               CASE WHEN channel = 'G' THEN meth_g ELSE meth_r END AS v
        FROM sig
        UNION ALL
        SELECT sample_label, channel,
               CASE WHEN channel = 'G' THEN unmeth_g ELSE unmeth_r END
                 AS v
        FROM sig
      ), ranked AS (
        SELECT sample_label, channel, CAST(v AS DOUBLE) AS v,
               row_number() OVER (PARTITION BY sample_label, channel
                                  ORDER BY v DESC) AS rn
        FROM ib WHERE v IS NOT NULL
      )
      SELECT sample_label, channel,
             round(quantile_cont(v, 0.5), 6) AS median_intensity,
             round(quantile_cont(CASE WHEN rn <= 20 THEN v END, 0.5), 6)
               AS top20_median,
             count(*) AS n_values
      FROM ranked
      GROUP BY sample_label, channel
      ORDER BY sample_label, channel"""))

  /** A11 end-to-end — QC.betaStateProportions (QC.scala:85, reference
    * visualizations.py:1906-1922): hyper/hypo/mid/NA percentages per
    * sample. Threshold comparisons run on the identical double
    * quotient on both engines, so the boundary rows land the same
    * way. */
  val q69 = Q(
    "q69_beta_state_proportions",
    (s, d) => {
      import s.implicits._
      val betas = t(s, d, "lineitem").select(
        $"l_suppkey".cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_orderkey" % 23 === 0, lit(null).cast("double"))
          .otherwise($"l_quantity" / 50.0).as("beta"))
      graft.qc.QC.betaStateProportions(betas, "sample_label")
        .select($"sample_label",
          round($"pct_na", 6).as("pct_na"),
          round($"pct_hypo", 6).as("pct_hypo"),
          round($"pct_mid", 6).as("pct_mid"),
          round($"pct_hyper", 6).as("pct_hyper"), $"n")
        .orderBy($"sample_label")
    },
    Some("""
      WITH betas AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               CASE WHEN l_orderkey % 23 = 0 THEN NULL
                    ELSE l_quantity / 50.0 END AS beta
        FROM lineitem
      )
      SELECT sample_label,
             round(100.0 * avg(CASE WHEN beta IS NULL THEN 1.0
                                    ELSE 0.0 END), 6) AS pct_na,
             round(100.0 * avg(CASE WHEN beta < 0.3 THEN 1.0
                                    ELSE 0.0 END), 6) AS pct_hypo,
             round(100.0 * avg(CASE WHEN beta >= 0.3 AND beta <= 0.7
                                    THEN 1.0 ELSE 0.0 END), 6)
               AS pct_mid,
             round(100.0 * avg(CASE WHEN beta > 0.7 THEN 1.0
                                    ELSE 0.0 END), 6) AS pct_hyper,
             count(*) AS n
      FROM betas
      GROUP BY sample_label
      ORDER BY sample_label"""))

  /** Cross-corpus line-level exact dedup (Dedup.dedupLines — the CCNet
    * hygiene pass, no reference counterpart; published pattern). The
    * driver corpus is single-line word streams, so the query first
    * re-shapes each document into 5-word "lines" (pure array
    * arithmetic, exact on both engines), then drops every line whose
    * normal form appears in ≥ 2 distinct documents — at sf0.01 that is
    * ~260 planted-duplicate segments. */
  val q70 = Q(
    "q70_line_dedup",
    (s, d) => {
      import s.implicits._
      val chunked = t(s, d, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .select($"doc_id",
          array_join(transform(
            sequence(lit(0),
              ((size($"w") + lit(4)) / lit(5)).cast("int") - 1),
            k => array_join(slice($"w", k * 5 + 1, lit(5)), " ")),
            "\n").as("text"))
      graft.operators.Dedup.dedupLines(chunked, "doc_id", "text",
          minDocFreq = 2)
        .orderBy($"doc_id")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), lines AS (
        SELECT doc_id, t.k,
               array_to_string(w[1 + 5 * t.k : 5 * t.k + 5], ' ')
                 AS line
        FROM docs, UNNEST(generate_series(0,
               CAST((len(w) + 4) // 5 AS BIGINT) - 1)) AS t(k)
      ), norm AS (
        SELECT doc_id, k, line, lower(trim(line)) AS nl FROM lines
      ), bad AS (
        SELECT nl FROM norm GROUP BY nl
        HAVING count(DISTINCT doc_id) >= 2
      ), kept AS (
        SELECT * FROM norm WHERE nl NOT IN (SELECT nl FROM bad)
      ), reasm AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY k) AS text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
      ), tot AS (
        SELECT doc_id, count(*) AS n FROM norm GROUP BY doc_id
      )
      SELECT d.doc_id, coalesce(r.text, '') AS text,
             coalesce(r.n_kept, 0) AS n_kept,
             t.n - coalesce(r.n_kept, 0) AS n_dropped
      FROM (SELECT doc_id FROM documents) d
      JOIN tot t USING (doc_id)
      LEFT JOIN reasm r USING (doc_id)
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q65, q66, q67, q68, q69, q70)
}
