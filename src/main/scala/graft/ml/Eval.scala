package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Classifier-evaluation surfaces over corpus-scale scored frames.
  *
  * The flagship is the EXACT ROC-AUC: the Mann-Whitney U statistic with
  * midrank tie correction, kept entirely in integer arithmetic until the
  * single final division. Published quality-filter pipelines gate corpora
  * on classifier scores (reference's QC gates are the same shape at probe
  * scale); before trusting such a gate one measures its AUC against
  * labels — on ALL the data, not a sample, because the interesting
  * failures live in the tail buckets a sample misses.
  */
object Eval {

  /** Exact ROC-AUC via the rank-sum identity, tie-corrected (midranks):
    *
    *   AUC = [R⁺ − n⁺(n⁺+1)/2] / (n⁺ n⁻),  R⁺ = Σ over positives of rank
    *
    * computed WITHOUT ranking rows: scores collapse to a distinct-score
    * census first (`groupBy(score)` — one shuffle, output bounded by
    * |distinct scores| ≪ |rows| for any quantized/ratio-valued score),
    * then the cumulative row count *before* each score comes from the
    * partition-offset prefix sum ([[Ranks.withGlobalPrefixSum]] — ONE
    * range shuffle over the census, never a single-partition window,
    * never a corpus-wide `row_number`). All positives sharing score s
    * carry midrank cum(s) + (n(s)+1)/2, so
    *
    *   2·R⁺ = Σ_s n⁺(s) · (2·cum(s) + n(s) + 1)
    *
    * stays in BIGINT. Returns ONE row:
    * `n_pos, n_neg, u_times2 (= 2U, exact), auc`. The lone float is the
    * final division of two exact integers — bit-identical everywhere.
    *
    * `labelCol` must be integral 0/1. */
  def exactAuc(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = {
    val census = df
      .select(scoreCol.as("score"), labelCol.cast("long").as("y"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val cum = Ranks.withGlobalPrefixSum(census, Seq(col("score")),
      valueCol = "n", outCol = "cum_before", exclusive = true)
    cum.agg(
        sum(col("n_pos")).as("np"),
        (sum(col("n")) - sum(col("n_pos"))).as("nn"),
        sum(col("n_pos") *
          (lit(2L) * col("cum_before") + col("n") + lit(1L)))
          .as("r2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        (col("r2") - col("np") * (col("np") + lit(1L))).as("u_times2"))
      .withColumn("auc",
        col("u_times2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")))
  }
}
