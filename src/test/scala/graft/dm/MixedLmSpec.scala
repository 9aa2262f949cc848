package graft.dm

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec

class MixedLmSpec extends SparkSpec {
  import spark.implicits._

  test("recovers fixed effects under strong random intercepts") {
    // 6 groups × 4 obs; y = 2 + 3·x + b_g + ε, b_g big, ε small
    val rnd = new scala.util.Random(3)
    val bg = Array.fill(6)(rnd.nextGaussian() * 2.0)
    val rows = for (g <- 0 until 6; _ <- 0 until 4) yield {
      val xv = rnd.nextDouble()
      (Array(1.0, xv), 2.0 + 3.0 * xv + bg(g) + rnd.nextGaussian() * 0.05, g)
    }
    val x = DenseMatrix(rows.map(_._1): _*)
    val y = DenseVector(rows.map(_._2).toArray)
    val g = rows.map(_._3).toArray
    val Some(fit) = MixedLm.fit(x, y, g)
    // 24 obs with 2.0-sd random intercepts: finite-sample error ~0.2
    assert(math.abs(fit.beta(1) - 3.0) < 0.25, s"slope ${fit.beta(1)}")
    // variance decomposition: group variance dominates residual
    assert(fit.sigma2b > 5 * fit.sigma2e,
      s"s2b=${fit.sigma2b} s2e=${fit.sigma2e}")
    assert(fit.pValues(1) < 1e-6)
  }

  test("zero group variance degenerates toward OLS") {
    val rnd = new scala.util.Random(9)
    val rows = for (g <- 0 until 4; _ <- 0 until 5) yield {
      val xv = rnd.nextDouble()
      (Array(1.0, xv), 1.0 + 2.0 * xv + rnd.nextGaussian() * 0.1, g)
    }
    val x = DenseMatrix(rows.map(_._1): _*)
    val y = DenseVector(rows.map(_._2).toArray)
    val Some(fit) = MixedLm.fit(x, y, rows.map(_._3).toArray)
    // OLS estimate via breeze
    val ols = breeze.linalg.pinv(x) * y
    assert(math.abs(fit.beta(1) - ols(1)) < 0.05)
    assert(fit.sigma2b < 0.5 * fit.sigma2e + 0.05)
  }

  test("distributed mixed DMP: group-aware p-values, f_pvalue is NaN") {
    val sheet = Seq(
      Map("sample_id" -> "a1", "grp" -> "CTRL", "rep" -> "r1"),
      Map("sample_id" -> "a2", "grp" -> "CTRL", "rep" -> "r1"),
      Map("sample_id" -> "a3", "grp" -> "CTRL", "rep" -> "r2"),
      Map("sample_id" -> "a4", "grp" -> "CTRL", "rep" -> "r2"),
      Map("sample_id" -> "b1", "grp" -> "CASE", "rep" -> "r3"),
      Map("sample_id" -> "b2", "grp" -> "CASE", "rep" -> "r3"),
      Map("sample_id" -> "b3", "grp" -> "CASE", "rep" -> "r4"),
      Map("sample_id" -> "b4", "grp" -> "CASE", "rep" -> "r4"))
    val design = Dm.designMatrix(sheet, "sample_id", "~ grp",
      Map("grp" -> "CTRL"))
    val groups = sheet.map(m => m("sample_id") -> m("rep")).toMap
    val betas = sheet.flatMap { m =>
      val s = m("sample_id")
      val base = if (m("grp") == "CASE") 0.7f else 0.3f
      // cg2 is noise around 0.5 with IDENTICAL per-group noise
      // multisets (group means equal by construction) — a constant 0.5
      // would sit on the degenerate sse=0 knife edge where the fit
      // correctly returns the NaN row (the reference's LinAlgError
      // path, dm.py:67-69), which is not what this test is about
      val noise = Map("a1" -> 1, "a2" -> -2, "a3" -> 3, "a4" -> -1,
        "b1" -> 3, "b2" -> -1, "b3" -> 1, "b4" -> -2)
      Seq((s, "cg1", base + (m("rep").hashCode % 5) * 0.002f),
        (s, "cg2", 0.5f + noise(s) * 0.01f))
    }.toDF("sample_label", "probe_id", "beta")
    val dmp = Dm.computeDmpMixed(spark, betas, design, groups)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(dmp("cg1").getAs[Double]("f_pvalue").isNaN)
    assert(dmp("cg1").getAs[Double]("grp_T_CASE_estimate") > 0.35)
    assert(dmp("cg1").getAs[Double]("grp_T_CASE_p_value") < 0.05)
    assert(dmp("cg2").getAs[Double]("grp_T_CASE_p_value") > 0.3)
  }
}
