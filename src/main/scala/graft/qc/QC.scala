package graft.qc

import graft.prep.Prep
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-control aggregations (SURVEY.md A6-A9; reference
  * pylluminator/quality_control.py:55-253): per-sample scalar stats,
  * detection rates, per-chromosome/type counts, dye-bias summary. All are
  * one-shuffle groupBy aggregations with map-side partials.
  */
object QC {

  /** A8 — per-sample intensity summary over the signal cells: mean /
    * exact median / NA counts for M and U (quality_control.py:55-130). */
  def intensitySummary(signal: DataFrame): DataFrame = {
    val m = coalesce(col("meth_g"), lit(0f)) + coalesce(col("meth_r"), lit(0f))
    val u = coalesce(col("unmeth_g"), lit(0f)) +
      coalesce(col("unmeth_r"), lit(0f))
    val mNull = col("meth_g").isNull && col("meth_r").isNull
    val uNull = col("unmeth_g").isNull && col("unmeth_r").isNull
    signal.groupBy("sample_label").agg(
      avg(when(!mNull, m)).as("mean_meth"),
      percentile(when(!mNull, m), lit(0.5)).as("median_meth"),
      avg(when(!uNull, u)).as("mean_unmeth"),
      percentile(when(!uNull, u), lit(0.5)).as("median_unmeth"),
      sum(when(mNull, 1L).otherwise(0L)).as("n_na_meth"),
      sum(when(uNull, 1L).otherwise(0L)).as("n_na_unmeth"),
      count(lit(1)).as("n_probes"))
  }

  /** A8 — detection rate per sample per probe_type: fraction of probes
    * with pOOBAH p-value below the threshold
    * (quality_control.py:176-190). */
  def detectionRate(signal: DataFrame,
      threshold: Double = 0.05): DataFrame =
    signal.filter(col("p_value").isNotNull)
      .groupBy("sample_label", "probe_type")
      .agg(
        (sum(when(col("p_value") < threshold, 1L).otherwise(0L)) /
          count(lit(1))).as("detection_rate"),
        count(lit(1)).as("n_probes"))

  /** A6 — probe counts per chromosome / per type (samples.py:1703-1731).
    * `manifest` carries chromosome per probe. */
  def probeCounts(signal: DataFrame, manifest: DataFrame): DataFrame =
    signal.join(broadcast(manifest.select("probe_id", "chromosome")
      .dropDuplicates("probe_id")), Seq("probe_id"), "left")
      .groupBy("sample_label", "chromosome")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("meth_g").isNull && col("meth_r").isNull &&
          col("unmeth_g").isNull && col("unmeth_r").isNull, 1L)
          .otherwise(0L)).as("n_masked"))

  /** A9 — dye-bias summary per sample: median and top-20 median of the
    * type-I in-band intensity per channel (samples.py:1372-1376,
    * quality_control.py:193-207). Top-20 via a sorted-slice aggregation
    * (no global sort). */
  def dyeBiasSummary(signal: DataFrame): DataFrame =
    Prep.ibCells(signal.filter(col("inf_type") === "I"))
      .groupBy("sample_label", "channel")
      .agg(
        percentile(col("value"), lit(0.5)).as("median_intensity"),
        expr("""aggregate(
            slice(reverse(sort_array(collect_list(CAST(value AS DOUBLE)))), 1, 20),
            CAST(array() AS ARRAY<DOUBLE>), (acc, x) -> array_append(acc, x),
            acc -> CASE WHEN size(acc) = 0 THEN CAST(NULL AS DOUBLE)
                        WHEN size(acc) % 2 = 1 THEN acc[CAST(size(acc) / 2 AS INT)]
                        ELSE (acc[CAST(size(acc) / 2 AS INT) - 1]
                              + acc[CAST(size(acc) / 2 AS INT)]) / 2 END)""")
          .as("top20_median"),
        count(lit(1)).as("n_values"))

  /** A10 — top-N most-variable probes across samples from the betas long
    * table (ml.py:62-66): groupBy variance + TakeOrderedAndProject.
    *
    * Variance via the explicit moments formula ((Σx² − (Σx)²/n)/(n−1))
    * rather than var_samp: the two are mathematically identical, but
    * var_samp's streaming merge updates divide mid-stream, so its last
    * bits depend on the partition merge tree — this spelling's sums are
    * order-independent whenever betas are exactly representable, making
    * the top-N cut partition-invariant (and it's a cheaper one-pass
    * declarative aggregate). Cancellation is benign here: betas are
    * bounded, so Σx² and (Σx)²/n are the same magnitude as n·beta². */
  def mostVariableProbes(betas: DataFrame, n: Int): DataFrame =
    betas.filter(col("beta").isNotNull)
      .groupBy("probe_id")
      .agg(count(lit(1L)).as("n_obs"),
        sum(col("beta").cast("double")).as("s1"),
        sum(col("beta").cast("double") * col("beta").cast("double"))
          .as("s2"))
      .filter(col("n_obs") > 1)
      .select(col("probe_id"),
        ((col("s2") - col("s1") * col("s1") / col("n_obs")) /
          (col("n_obs") - 1)).as("beta_variance"))
      .orderBy(col("beta_variance").desc, col("probe_id"))
      .limit(n)

  /** A11 — beta-state proportions per group key (hyper/hypo/mid/NA %,
    * visualizations.py:1906-1922) — conditional aggregation, no UDAF. */
  def betaStateProportions(betas: DataFrame, groupCol: String,
      hypoTh: Double = 0.3, hyperTh: Double = 0.7): DataFrame =
    betas.groupBy(groupCol)
      .agg(
        (avg(when(col("beta").isNull, 1.0)
          .otherwise(0.0)) * 100).as("pct_na"),
        (avg(when(col("beta") < hypoTh, 1.0).otherwise(0.0)) * 100)
          .as("pct_hypo"),
        (avg(when(col("beta") >= hypoTh && col("beta") <= hyperTh, 1.0)
          .otherwise(0.0)) * 100).as("pct_mid"),
        (avg(when(col("beta") > hyperTh, 1.0).otherwise(0.0)) * 100)
          .as("pct_hyper"),
        count(lit(1)).as("n"))

  /** A12/L23 — replicate-consistency stats (visualizations.py:2069-2131
    * `analyze_replicates`): per probe and replicate group (samples that
    * share `sampleIdCol` in the sheet), the sample standard deviation of
    * beta across the group's technical replicates (pandas std ddof=1 →
    * stddev_samp). Output: (probe_id, replicate, beta_std, n_replicates).
    * The sheet is a broadcast dimension; the betas table shuffles once
    * on (probe_id, replicate) with map-side partial aggregation. */
  def replicateStats(betas: DataFrame, sheet: DataFrame,
      sampleIdCol: String,
      sampleLabelCol: String = "sample_label"): DataFrame =
    betas.join(broadcast(sheet.select(
        col(sampleLabelCol).as("sample_label"),
        col(sampleIdCol).as("replicate"))), Seq("sample_label"))
      .groupBy("probe_id", "replicate")
      .agg(stddev_samp(col("beta")).as("beta_std"),
        count(col("beta")).as("n_replicates"))

  /** A12/L23 — the long violin-feed table the reference plots
    * (visualizations.py:2116-2119): each per-probe replicate std labeled
    * by its probe's design 'type I G' / 'type I R' / 'type II ' string,
    * derived from the signal frame's (inf_type, channel). */
  def replicateStatsByChannel(stats: DataFrame,
      signal: DataFrame): DataFrame = {
    val labels = signal
      .select(col("probe_id"), col("inf_type"), col("channel"))
      .dropDuplicates("probe_id")
      .withColumn("channel_label",
        concat(lit("type "), col("inf_type"), lit(" "),
          coalesce(col("channel"), lit(""))))
      .select("probe_id", "channel_label")
    stats.join(broadcast(labels), Seq("probe_id"), "left")
      .select(col("replicate"), col("channel_label"), col("probe_id"),
        col("beta_std"))
  }

  /** L22-feed — per-sample beta histogram (KDE-feeding table,
    * visualizations.py:222): width_bucket counts over [0,1]. */
  def betaHistogram(betas: DataFrame, nBins: Int = 100): DataFrame =
    betas.filter(col("beta").isNotNull)
      .withColumn("bin",
        least(floor(col("beta") * nBins).cast("int"), lit(nBins - 1)))
      .groupBy("sample_label", "bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_start", col("bin").cast("double") / nBins)
}
