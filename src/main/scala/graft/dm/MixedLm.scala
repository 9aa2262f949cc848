package graft.dm

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import org.apache.commons.math3.distribution.NormalDistribution

/** L2 — random-intercept mixed linear model, fit per probe (the
  * reference delegates to statsmodels MixedLM when a replicate
  * `group_column` is given, dm.py:62-67; no JVM library exists, so this
  * is a from-scratch profiled-likelihood implementation).
  *
  * Model: y = Xβ + Z b + ε, b ~ N(0, σ²_b I_q), ε ~ N(0, σ²_e I_n),
  * Z = group indicator matrix. For a given variance ratio ρ = σ²_b/σ²_e,
  * V(ρ) = I + ρ Z Zᵀ is block diagonal by group, so V⁻¹ has the closed
  * Sherman-Morrison block form and GLS gives β̂(ρ), σ̂²_e(ρ) in closed
  * form. The scalar ρ is optimized by golden-section search on the
  * profiled (RE)ML log-likelihood — per-probe work is O(iterations × n),
  * run inside the same per-probe fan-out as the OLS path.
  *
  * Inference: Wald z-tests on β̂ (statsmodels MixedLM reports z-scores
  * against the normal, not t).
  */
object MixedLm {

  final case class Fit(beta: Array[Double], se: Array[Double],
      zValues: Array[Double], pValues: Array[Double],
      sigma2e: Double, sigma2b: Double, logLik: Double)

  /** Fit y = Xβ + (1|group). `groups` are integer group ids (0-based,
    * contiguous). Returns None when degenerate. */
  def fit(x: DenseMatrix[Double], y: DenseVector[Double],
      groups: Array[Int], reml: Boolean = true): Option[Fit] = {
    val n = x.rows
    val p = x.cols
    if (n <= p + 1) return None
    val nGroups = groups.max + 1
    val groupIdx: Array[Array[Int]] =
      (0 until nGroups).map(g => groups.indices.filter(groups(_) == g)
        .toArray).toArray

    // rho-INDEPENDENT sufficient statistics, computed once per probe:
    // XᵀX, Xᵀy, yᵀy and the per-group row sums. Each golden-section
    // evaluation then costs O(nGroups·p²) instead of re-walking the
    // data — the search makes ~40 evaluations, so hoisting these is a
    // ~n/nGroups-fold cut of the per-probe fit cost.
    val xtx0 = x.t * x
    val xty0 = x.t * y
    val yty0 = y dot y
    val gsums: Array[(Int, DenseVector[Double], Double)] =
      Array.tabulate(nGroups) { g =>
        val idx = groupIdx(g)
        val xs = DenseVector.zeros[Double](p)
        var ys = 0.0
        idx.foreach { i => xs += x(i, ::).t; ys += y(i) }
        (idx.length, xs, ys)
      }

    // GLS for fixed rho: V⁻¹ = I − Z diag(rho/(1+rho·m_g)) Zᵀ blockwise
    // XᵀV⁻¹X = XᵀX − Σ_g c_g (Σ_{i∈g} x_i)(Σ_{i∈g} x_i)ᵀ, c_g = ρ/(1+ρ m_g)
    def glsParts(rho: Double)
        : (DenseMatrix[Double], DenseVector[Double], Double, Double) = {
      val xtx = xtx0.copy
      val xty = xty0.copy
      var yty = yty0
      var logDetV = 0.0
      var g = 0
      while (g < nGroups) {
        val (m, xs, ys) = gsums(g)
        val c = rho / (1.0 + rho * m)
        logDetV += math.log(1.0 + rho * m)
        xtx -= (xs * xs.t) * c
        xty -= xs * (c * ys)
        yty -= c * ys * ys
        g += 1
      }
      (xtx, xty, yty, logDetV)
    }

    // closed-form 2×2 inverse for the dominant intercept+covariate case
    // (identical math to LAPACK inv up to ulps; avoids a JNI round trip
    // per likelihood evaluation)
    def invOf(xtx: DenseMatrix[Double]): DenseMatrix[Double] =
      if (p == 2) {
        val det = xtx(0, 0) * xtx(1, 1) - xtx(0, 1) * xtx(1, 0)
        DenseMatrix((xtx(1, 1) / det, -xtx(0, 1) / det),
          (-xtx(1, 0) / det, xtx(0, 0) / det))
      } else inv(xtx)

    def gls(rho: Double): (DenseVector[Double], DenseMatrix[Double],
        Double, Double) = {
      val (xtx, xty, yty, logDetV) = glsParts(rho)
      val xtxInv = invOf(xtx)
      val beta = xtxInv * xty
      // SSE in the V metric: yᵀV⁻¹y − βᵀ XᵀV⁻¹y
      val sse = yty - (beta dot xty)
      (beta, xtxInv, sse, logDetV)
    }

    def negProfiledLL(rho: Double): Double = {
      val (_, xtxInv, sse, logDetV) = gls(rho)
      val dof = if (reml) n - p else n
      val sigma2 = sse / dof
      if (sigma2 <= 0 || sigma2.isNaN) return Double.MaxValue
      var ll = -0.5 * (dof * math.log(sigma2) + logDetV + dof)
      if (reml) {
        // REML adjustment: −½ log|XᵀV⁻¹X| (xtxInv = (XᵀV⁻¹X)⁻¹)
        val det =
          if (p == 2)
            xtxInv(0, 0) * xtxInv(1, 1) - xtxInv(0, 1) * xtxInv(1, 0)
          else breeze.linalg.det(xtxInv)
        if (det <= 0) return Double.MaxValue
        ll += 0.5 * math.log(det)
      }
      -ll
    }

    // golden-section search on log-scale rho ∈ [1e-8, 1e4]
    val phi = (math.sqrt(5.0) - 1) / 2
    var lo = math.log(1e-8)
    var hi = math.log(1e4)
    var c1 = hi - phi * (hi - lo)
    var c2 = lo + phi * (hi - lo)
    var f1 = negProfiledLL(math.exp(c1))
    var f2 = negProfiledLL(math.exp(c2))
    var it = 0
    while (hi - lo > 1e-6 && it < 200) {
      if (f1 < f2) { hi = c2; c2 = c1; f2 = f1
        c1 = hi - phi * (hi - lo); f1 = negProfiledLL(math.exp(c1))
      } else { lo = c1; c1 = c2; f1 = f2
        c2 = lo + phi * (hi - lo); f2 = negProfiledLL(math.exp(c2))
      }
      it += 1
    }
    val rho = math.exp((lo + hi) / 2)
    val (beta, xtxInv, sse, _) = gls(rho)
    val dof = if (reml) n - p else n
    val sigma2e = sse / dof
    if (sigma2e <= 0 || sigma2e.isNaN) return None
    val normal = new NormalDistribution()
    val se = Array.tabulate(p)(j => math.sqrt(sigma2e * xtxInv(j, j)))
    val z = Array.tabulate(p)(j => if (se(j) == 0) Double.NaN
      else beta(j) / se(j))
    val pv = z.map(zz => if (zz.isNaN) Double.NaN
      else 2.0 * (1.0 - normal.cumulativeProbability(math.abs(zz))))
    Some(Fit(beta.toArray, se, z, pv, sigma2e, rho * sigma2e,
      -negProfiledLL(rho)))
  }
}
