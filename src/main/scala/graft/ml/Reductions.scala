package graft.ml

import breeze.linalg.{eigSym, inv, svd, DenseMatrix, DenseVector, norm}
import org.apache.spark.sql.DataFrame

/** L19 — the reference's full dimensionality-reduction surface
  * (ml.py:42-45): one dispatcher over the same 14 model keys
  * PCA / MDS / DL / FA / FICA / IPCA / KPCA / LDA / MBDL / MBNMF /
  * MBSPCA / NMF / SPCA / TSVD.
  *
  * Scale split (same boundary as the reference's sklearn call): the
  * distributed part is top-variance probe selection over ~1M probes
  * (Ml.topVarianceMatrix — one groupBy + TakeOrdered); the collected
  * (n_samples × n_probes) matrix is small by construction, and every
  * algorithm below is a deterministic local Breeze routine — no RNG
  * state, seeded mixing where an init needs "randomness", fixed
  * iteration counts. fit_transform semantics: returns the (n_samples ×
  * n_components) embedding, like sklearn's.
  *
  * Documented divergences from sklearn (the reference accepts model
  * noise itself — it fits with sklearn defaults and plots):
  *   - MDS is classical (Torgerson) MDS, not SMACOF;
  *   - IPCA ≡ PCA (incremental fitting is a memory strategy; on batch
  *     input the subspace is identical);
  *   - MBDL ≡ DL and MBNMF ≡ NMF and MBSPCA ≡ SPCA (mini-batching is an
  *     optimization detail at this matrix size);
  *   - LDA is KL-divergence NMF with Dirichlet-style smoothing on
  *     row-normalized output (sklearn's variational LDA on continuous
  *     betas is itself a semantic stretch);
  *   - DL/FA/FICA/SPCA use standard textbook iterations (ISTA
  *     dictionary learning, principal-axis factoring, tanh FastICA
  *     with symmetric decorrelation, soft-thresholded power method).
  */
object Reductions {

  val ModelKeys: Seq[String] = Seq("PCA", "MDS", "DL", "FA", "FICA",
    "IPCA", "KPCA", "LDA", "MBDL", "MBNMF", "MBSPCA", "NMF", "SPCA",
    "TSVD")

  /** The reference's dimensionality_reduction (ml.py:14-86): select the
    * nProbes most-variable probes, center unless LDA/NMF-family
    * (ml.py:76-79), fit the keyed model, return the embedding. */
  def dimensionalityReduction(betas: DataFrame, model: String = "PCA",
      nComponents: Int = 2, nProbes: Int = 1000,
      kernel: String = "linear", gamma: Option[Double] = None,
      seed: Long = 0L): Ml.Reduction = {
    require(ModelKeys.contains(model),
      s"Unknown model $model. Known models are ${ModelKeys.mkString(", ")}")
    val (samples, _, x0) = Ml.topVarianceMatrix(betas, nProbes)
    val center = !Seq("LDA", "MBNMF", "NMF").contains(model)
    val x = if (center) centered(x0) else x0
    val k = math.min(nComponents, math.min(x.rows, x.cols))
    val coords = model match {
      case "PCA" | "IPCA" | "TSVD" => pcaScores(x, k)
      case "MDS" => mdsScores(x, k)
      case "KPCA" => kpcaScores(x, k, kernel, gamma)
      case "FICA" => fastIca(x, k)
      case "FA" => factorScores(x, k)
      case "SPCA" | "MBSPCA" => sparsePcaScores(x, k)
      case "DL" | "MBDL" => dictionaryCodes(x, k, seed)
      case "NMF" | "MBNMF" => nmfW(x, k, seed, kl = false)
      case "LDA" => rowNormalize(nmfW(x, k, seed, kl = true))
    }
    Ml.Reduction(samples, coords, Seq.empty)
  }

  private def centered(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = x.copy
    for (j <- 0 until x.cols) {
      var m = 0.0
      for (i <- 0 until x.rows) m += x(i, j)
      m /= x.rows
      for (i <- 0 until x.rows) out(i, j) -= m
    }
    out
  }

  private def pcaScores(x: DenseMatrix[Double],
      k: Int): DenseMatrix[Double] = {
    val s = svd.reduced(x)
    s.U(::, 0 until k) * breeze.linalg.diag(s.S(0 until k))
  }

  private def mdsScores(x: DenseMatrix[Double],
      k: Int): DenseMatrix[Double] = {
    // classical MDS of Euclidean row distances == PCA scores of the
    // centered rows; reuse the Gram route for clarity
    val g = x * x.t
    gramEigenScores(doubleCenter(g), k)
  }

  private def doubleCenter(g: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = g.rows
    val rowMean = DenseVector.tabulate(n)(i =>
      breeze.linalg.sum(g(i, ::).t) / n)
    val grand = breeze.linalg.sum(rowMean) / n
    DenseMatrix.tabulate(n, n)((i, j) =>
      g(i, j) - rowMean(i) - rowMean(j) + grand)
  }

  private def gramEigenScores(g: DenseMatrix[Double],
      k: Int): DenseMatrix[Double] = {
    val eig = eigSym(g)
    val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1)
    DenseMatrix.tabulate(g.rows, k) { (i, c) =>
      val (ev, idx) = order(c)
      eig.eigenvectors(i, idx) * math.sqrt(math.max(ev, 0.0))
    }
  }

  /** Kernel PCA (sklearn default kernel: linear; rbf supported with
    * gamma defaulting to 1/n_features). */
  private def kpcaScores(x: DenseMatrix[Double], k: Int,
      kernel: String, gamma: Option[Double]): DenseMatrix[Double] = {
    val kM = kernel match {
      case "linear" => x * x.t
      case "rbf" =>
        val g = gamma.getOrElse(1.0 / x.cols)
        val n = x.rows
        DenseMatrix.tabulate(n, n) { (i, j) =>
          var s = 0.0
          for (c <- 0 until x.cols) {
            val d = x(i, c) - x(j, c); s += d * d
          }
          math.exp(-g * s)
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported kernel $other")
    }
    gramEigenScores(doubleCenter(kM), k)
  }

  /** FastICA: PCA-whiten to k components, tanh-nonlinearity fixed-point
    * iteration with symmetric decorrelation, identity init
    * (deterministic). Returns the estimated sources (n × k). */
  private def fastIca(x: DenseMatrix[Double], k: Int,
      maxIter: Int = 200, tol: Double = 1e-6): DenseMatrix[Double] = {
    val n = x.rows
    val s = svd.reduced(x)
    // whitened data: U_k * sqrt(n) (unit-variance components)
    val z = s.U(::, 0 until k) * math.sqrt(n.toDouble)
    var w = DenseMatrix.eye[Double](k)
    def decorrelate(m: DenseMatrix[Double]): DenseMatrix[Double] = {
      val e = eigSym(m * m.t)
      val d = DenseMatrix.tabulate(k, k)((i, j) =>
        if (i == j) 1.0 / math.sqrt(math.max(e.eigenvalues(i), 1e-12))
        else 0.0)
      e.eigenvectors * d * e.eigenvectors.t * m
    }
    w = decorrelate(w)
    var it = 0
    var delta = 1.0
    while (it < maxIter && delta > tol) {
      val wx = z * w.t // n × k projections
      val gwx = wx.map(math.tanh)
      val gp = wx.map(v => 1.0 - math.pow(math.tanh(v), 2))
      val wNew0 = (gwx.t * z) / n.toDouble
      val gpMean = DenseVector.tabulate(k)(c =>
        breeze.linalg.sum(gp(::, c)) / n.toDouble)
      val wNew = DenseMatrix.tabulate(k, k)((i, j) =>
        wNew0(i, j) - gpMean(i) * w(i, j))
      val wd = decorrelate(wNew)
      delta = (0 until k).map(i =>
        math.abs(math.abs((wd(i, ::) * w(i, ::).t)) - 1.0)).max
      w = wd
      it += 1
    }
    z * w.t
  }

  /** Principal-axis factor analysis: iterate communalities on the
    * covariance diagonal, regression-method factor scores. */
  private def factorScores(x: DenseMatrix[Double], k: Int,
      iters: Int = 30): DenseMatrix[Double] = {
    val n = x.rows
    val s = (x.t * x) / math.max(n - 1, 1).toDouble // m × m covariance
    val m = s.rows
    val h = DenseVector.tabulate(m)(j => s(j, j)) // communalities
    var loadings = DenseMatrix.zeros[Double](m, k)
    for (_ <- 0 until iters) {
      val r = s.copy
      for (j <- 0 until m) r(j, j) = h(j)
      val eig = eigSym(r)
      val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1)
      loadings = DenseMatrix.tabulate(m, k) { (j, c) =>
        val (ev, idx) = order(c)
        eig.eigenvectors(j, idx) * math.sqrt(math.max(ev, 0.0))
      }
      for (j <- 0 until m) {
        var hh = 0.0
        for (c <- 0 until k) hh += loadings(j, c) * loadings(j, c)
        h(j) = math.min(hh, s(j, j))
      }
    }
    // regression scores: F = X Ψ⁻¹ L (Lᵀ Ψ⁻¹ L + I)⁻¹
    val psi = DenseVector.tabulate(m)(j =>
      math.max(s(j, j) - h(j), 1e-6))
    val psiInvL = DenseMatrix.tabulate(m, k)((j, c) =>
      loadings(j, c) / psi(j))
    val mInv = inv(loadings.t * psiInvL + DenseMatrix.eye[Double](k))
    x * psiInvL * mInv
  }

  /** Sparse PCA via deflated soft-thresholded power iterations; returns
    * X · V over the sparse components. */
  private def sparsePcaScores(x: DenseMatrix[Double], k: Int,
      alphaFrac: Double = 0.5, iters: Int = 100): DenseMatrix[Double] = {
    var res = x.copy
    val m = x.cols
    val comps = DenseMatrix.zeros[Double](m, k)
    for (c <- 0 until k) {
      val s = svd.reduced(res)
      var v = s.Vt(0, ::).t.copy
      for (_ <- 0 until iters) {
        val u = res * v
        var w = res.t * u
        val thr = alphaFrac * breeze.linalg.max(w.map(math.abs))
        w = w.map(wi =>
          math.signum(wi) * math.max(math.abs(wi) - thr, 0.0))
        val nw = norm(w)
        if (nw > 1e-12) v = w / nw
      }
      comps(::, c) := v
      val proj = res * v
      res = res - proj * v.t // deflate
    }
    x * comps
  }

  /** ISTA-style dictionary learning: codes A (n × k) against a
    * deterministic SVD-seeded dictionary; returns the sparse codes
    * (sklearn's fit_transform). */
  private def dictionaryCodes(x: DenseMatrix[Double], k: Int,
      seed: Long, iters: Int = 60): DenseMatrix[Double] = {
    val s = svd.reduced(x)
    var d = s.Vt(0 until k, ::).copy // k × m dictionary
    var a = DenseMatrix.zeros[Double](x.rows, k)
    val eta = 1.0 / math.max(math.pow(breeze.linalg.max(s.S), 2), 1e-12)
    val lambda = 0.1 * breeze.linalg.max(x.map(math.abs))
    for (_ <- 0 until iters) {
      // sparse-code step (ISTA)
      val grad = (a * d - x) * d.t
      a = (a - grad * eta).map(v =>
        math.signum(v) * math.max(math.abs(v) - eta * lambda, 0.0))
      // dictionary step (ridge least squares, rows re-normalized)
      val g = a.t * a + DenseMatrix.eye[Double](k) * 1e-6
      d = inv(g) * a.t * x
      for (r <- 0 until k) {
        val nr = norm(d(r, ::).t)
        if (nr > 1e-12) for (c <- 0 until d.cols) d(r, c) /= nr
      }
    }
    a
  }

  /** Multiplicative-update NMF (Frobenius, or KL for the LDA key) with
    * deterministic seeded-splitmix init. Returns W (n × k). */
  private def nmfW(x0: DenseMatrix[Double], k: Int, seed: Long,
      kl: Boolean, iters: Int = 200): DenseMatrix[Double] = {
    val eps = 1e-9
    val x = x0.map(v => math.max(v, 0.0))
    def mixed(i: Long): Double = {
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53)) + 0.1
    }
    var w = DenseMatrix.tabulate(x.rows, k)((i, j) =>
      mixed(seed + i.toLong * k + j))
    var h = DenseMatrix.tabulate(k, x.cols)((i, j) =>
      mixed(seed + 7919L + i.toLong * x.cols + j))
    for (_ <- 0 until iters) {
      if (!kl) {
        val wtx = w.t * x
        val wtwh = w.t * (w * h)
        h = DenseMatrix.tabulate(k, x.cols)((i, j) =>
          h(i, j) * (wtx(i, j) / (wtwh(i, j) + eps)))
        val xht = x * h.t
        val whht = (w * h) * h.t
        w = DenseMatrix.tabulate(x.rows, k)((i, j) =>
          w(i, j) * (xht(i, j) / (whht(i, j) + eps)))
      } else {
        val wh = (w * h).map(v => math.max(v, eps))
        val ratio = DenseMatrix.tabulate(x.rows, x.cols)((i, j) =>
          x(i, j) / wh(i, j))
        val num = ratio * h.t // n × k
        val hRowSum = DenseVector.tabulate(k)(i =>
          breeze.linalg.sum(h(i, ::).t))
        w = DenseMatrix.tabulate(x.rows, k)((i, j) =>
          w(i, j) * num(i, j) / math.max(hRowSum(j), eps))
        val wh2 = (w * h).map(v => math.max(v, eps))
        val ratio2 = DenseMatrix.tabulate(x.rows, x.cols)((i, j) =>
          x(i, j) / wh2(i, j))
        val num2 = w.t * ratio2 // k × m
        val wColSum = DenseVector.tabulate(k)(j =>
          breeze.linalg.sum(w(::, j)))
        h = DenseMatrix.tabulate(k, x.cols)((i, j) =>
          h(i, j) * num2(i, j) / math.max(wColSum(i), eps))
      }
    }
    w
  }

  private def rowNormalize(w: DenseMatrix[Double]): DenseMatrix[Double] =
    DenseMatrix.tabulate(w.rows, w.cols) { (i, j) =>
      var s = 0.0
      for (c <- 0 until w.cols) s += math.max(w(i, c), 0.0)
      if (s <= 0) 1.0 / w.cols else math.max(w(i, j), 0.0) / s
    }
}
