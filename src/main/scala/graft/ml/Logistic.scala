package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed binary logistic regression — the "train a quality
  * classifier, score the corpus" step of published curation pipelines
  * (fasttext-style quality filters in CCNet/RefinedWeb/Dolma; here the
  * model is the classic IRLS/Newton GLM fit, public numerics only).
  *
  * Model: P(y=1|x) = sigmoid(b0 + b1*f1 + b2*f2), two features plus
  * intercept. Each Newton iteration is ONE partially-aggregated pass
  * over the data computing the gradient (3 sums) and the symmetric
  * Hessian (6 sums) with the CURRENT coefficients inlined as literal
  * codegen expressions — no UDF, no per-row state. The 3x3 solve runs
  * on the driver via explicit Cramer determinants (the same closed
  * forms the q106 oracle transcribes, so both sides share the exact
  * arithmetic), and the updated coefficients broadcast back as
  * literals for the next pass. The projected feature frame is pinned
  * for the fixed number of passes and dropped after.
  *
  * Scale: per iteration the shuffle is one partial-aggregate row per
  * partition (9 doubles); the driver round-trip is a single 9-number
  * row — the KB-bounded scalar boundary every iterative fit in this
  * engine uses. Fixed iteration count keeps the trajectory
  * deterministic and partition-invariant (floating sums are the only
  * data-dependent reductions).
  */
object Logistic {

  /** Newton/IRLS fit; returns the coefficient trajectory as rows
    * `(iter, b0, b1, b2)` for iter = 1..iters (coefficients AFTER that
    * iteration's update; iteration starts from the zero vector). */
  def irlsFit2(df: DataFrame, f1: Column, f2: Column, label: Column,
      iters: Int = 6): Seq[(Int, Double, Double, Double)] = {
    val base = df.select(f1.cast("double").as("f1"),
      f2.cast("double").as("f2"), label.cast("double").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var b = Array(0.0, 0.0, 0.0)
      (1 to iters).map { i =>
        val eta = lit(b(0)) + lit(b(1)) * col("f1") + lit(b(2)) * col("f2")
        val p = lit(1.0) / (lit(1.0) + exp(-eta))
        val w = p * (lit(1.0) - p)
        val r = col("y") - p
        val row: Row = base.agg(
          sum(r).as("g0"),
          sum(r * col("f1")).as("g1"),
          sum(r * col("f2")).as("g2"),
          sum(w).as("h00"),
          sum(w * col("f1")).as("h01"),
          sum(w * col("f2")).as("h02"),
          sum(w * col("f1") * col("f1")).as("h11"),
          sum(w * col("f1") * col("f2")).as("h12"),
          sum(w * col("f2") * col("f2")).as("h22")).head()
        val Seq(g0, g1, g2, h00, h01, h02, h11, h12, h22) =
          (0 until 9).map(row.getDouble)
        b = Array(b(0) + cramer0(g0, g1, g2, h00, h01, h02, h11, h12, h22),
          b(1) + cramer1(g0, g1, g2, h00, h01, h02, h11, h12, h22),
          b(2) + cramer2(g0, g1, g2, h00, h01, h02, h11, h12, h22))
        (i, b(0), b(1), b(2))
      }
    } finally base.unpersist()
  }

  /** sigmoid(b0 + b1*f1 + b2*f2) as a codegen column. */
  def score2(b: (Double, Double, Double), f1: Column, f2: Column): Column =
    lit(1.0) / (lit(1.0) +
      exp(-(lit(b._1) + lit(b._2) * f1.cast("double")
        + lit(b._3) * f2.cast("double"))))

  // Cramer solve of the symmetric 3x3 system H * delta = g. The term
  // grouping below is transcribed VERBATIM into the q106 oracle SQL so
  // Spark and DuckDB run identical floating-point arithmetic.
  private def det(h00: Double, h01: Double, h02: Double, h11: Double,
      h12: Double, h22: Double): Double =
    h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02) +
      h02 * (h01 * h12 - h11 * h02)

  private def cramer0(g0: Double, g1: Double, g2: Double, h00: Double,
      h01: Double, h02: Double, h11: Double, h12: Double,
      h22: Double): Double =
    (g0 * (h11 * h22 - h12 * h12) - h01 * (g1 * h22 - h12 * g2) +
      h02 * (g1 * h12 - h11 * g2)) / det(h00, h01, h02, h11, h12, h22)

  private def cramer1(g0: Double, g1: Double, g2: Double, h00: Double,
      h01: Double, h02: Double, h11: Double, h12: Double,
      h22: Double): Double =
    (h00 * (g1 * h22 - h12 * g2) - g0 * (h01 * h22 - h12 * h02) +
      h02 * (h01 * g2 - g1 * h02)) / det(h00, h01, h02, h11, h12, h22)

  private def cramer2(g0: Double, g1: Double, g2: Double, h00: Double,
      h01: Double, h02: Double, h11: Double, h12: Double,
      h22: Double): Double =
    (h00 * (h11 * g2 - g1 * h12) - h01 * (h01 * g2 - g1 * h02) +
      g0 * (h01 * h12 - h11 * h02)) / det(h00, h01, h02, h11, h12, h22)
}
