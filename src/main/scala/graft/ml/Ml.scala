package graft.ml

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import graft.qc.QC
import org.apache.commons.math3.distribution.FDistribution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L19-L21 — dimensionality reduction and sample clustering (reference
  * pylluminator/ml.py:14-86, visualizations.py:396-533, :670).
  *
  * The sample dimension is tiny (n_samples rows) while probes are ~1M:
  * the heavy step — per-probe variance + top-N selection — is distributed
  * (one groupBy + TakeOrdered); only the (n_samples × n_probes) matrix of
  * the SELECTED probes is collected and decomposed locally with Breeze,
  * exactly the boundary the reference's sklearn call sits at. PCA/TSVD
  * use exact SVD; classical MDS via double-centered Gram eigen-decomp.
  */
object Ml {

  /** Distributed top-variance probe selection → collected dense matrix
    * (samples sorted, NaNs imputed with the probe mean, probes with no
    * variance dropped). Returns (sampleLabels, probeIds, matrix). */
  def topVarianceMatrix(betas: DataFrame, nProbes: Int)
      : (Seq[String], Seq[String], DenseMatrix[Double]) = {
    val top = QC.mostVariableProbes(betas, nProbes)
      .select("probe_id").collect().map(_.getString(0))
    val rows = betas.filter(col("probe_id").isin(top: _*))
      .groupBy("probe_id")
      .agg(map_from_entries(collect_list(struct(col("sample_label"),
        col("beta").cast("double")))).as("m"),
        avg(col("beta").cast("double")).as("mean_beta"))
      .collect()
    val samples = betas.select("sample_label").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val probeIds = rows.map(_.getString(0)).toSeq
    val mat = DenseMatrix.zeros[Double](samples.length, probeIds.length)
    rows.zipWithIndex.foreach { case (r, j) =>
      val m = r.getMap[String, Any](1)
      val mean = r.getDouble(2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val v = m.get(s).map {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.doubleValue()
          case null => mean
        }.getOrElse(mean)
        mat(i, j) = if (v.isNaN) mean else v
      }
    }
    (samples, probeIds, mat)
  }

  final case class Reduction(sampleLabels: Seq[String],
      coords: DenseMatrix[Double], explainedVarianceRatio: Seq[Double])

  /** L19/PCA — exact PCA of samples over the top-variance probes
    * (centered; ml.py:76-79). */
  def pca(betas: DataFrame, nComponents: Int = 2,
      nProbes: Int = 1000): Reduction = {
    val (samples, _, x) = topVarianceMatrix(betas, nProbes)
    val means = breeze.linalg.sum(x(::, breeze.linalg.*)).t / x.rows.toDouble
    val centered = x.copy
    for (i <- 0 until x.rows; j <- 0 until x.cols)
      centered(i, j) -= means(j)
    val s = svd.reduced(centered)
    val k = math.min(nComponents, s.S.length)
    val coords = s.U(::, 0 until k) * breeze.linalg.diag(s.S(0 until k))
    val totalVar = s.S.toArray.map(v => v * v).sum
    val evr = s.S.toArray.take(k).map(v => v * v / totalVar).toSeq
    Reduction(samples, coords, evr)
  }

  /** L19/TSVD — like PCA but without centering (ml.py: TSVD key). */
  def truncatedSvd(betas: DataFrame, nComponents: Int = 2,
      nProbes: Int = 1000): Reduction = {
    val (samples, _, x) = topVarianceMatrix(betas, nProbes)
    val s = svd.reduced(x)
    val k = math.min(nComponents, s.S.length)
    val coords = s.U(::, 0 until k) * breeze.linalg.diag(s.S(0 until k))
    val totalVar = s.S.toArray.map(v => v * v).sum
    Reduction(samples, coords,
      s.S.toArray.take(k).map(v => v * v / totalVar).toSeq)
  }

  /** L19/MDS — classical multidimensional scaling from the pairwise
    * Euclidean distances of the sample rows. */
  def classicalMds(betas: DataFrame, nComponents: Int = 2,
      nProbes: Int = 1000): Reduction = {
    val (samples, _, x) = topVarianceMatrix(betas, nProbes)
    val n = x.rows
    val d2 = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n; j <- 0 until n) {
      var s = 0.0
      for (c <- 0 until x.cols) { val d = x(i, c) - x(j, c); s += d * d }
      d2(i, j) = s
    }
    // double centering: B = -1/2 J D² J
    val rowMean = DenseVector.tabulate(n)(i =>
      breeze.linalg.sum(d2(i, ::).t) / n)
    val grand = breeze.linalg.sum(rowMean) / n
    val b = DenseMatrix.tabulate(n, n)((i, j) =>
      -0.5 * (d2(i, j) - rowMean(i) - rowMean(j) + grand))
    val eig = breeze.linalg.eigSym(b)
    val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1)
    val k = math.min(nComponents, n)
    val coords = DenseMatrix.zeros[Double](n, k)
    for (c <- 0 until k) {
      val (ev, idx) = order(c)
      val scale = math.sqrt(math.max(ev, 0.0))
      for (i <- 0 until n) coords(i, c) = eig.eigenvectors(i, idx) * scale
    }
    val totalPos = order.map(_._1).filter(_ > 0).sum
    Reduction(samples, coords,
      order.take(k).map(e => math.max(e._1, 0) / totalPos).toSeq)
  }

  // ---- L21: agglomerative clustering of samples (complete linkage) ----

  final case class Merge(a: Int, b: Int, dist: Double, size: Int)

  /** Complete-linkage agglomerative clustering over sample rows; cluster
    * ids follow scipy convention (leaves 0..n-1, merges n..2n-2).
    * n_samples is small → driver-side (visualizations.py:670). */
  def hierarchicalClustering(x: DenseMatrix[Double]): Seq[Merge] = {
    val n = x.rows
    def dist(i: Int, j: Int): Double = {
      var s = 0.0
      for (c <- 0 until x.cols) { val d = x(i, c) - x(j, c); s += d * d }
      math.sqrt(s)
    }
    var clusters: Map[Int, Set[Int]] =
      (0 until n).map(i => i -> Set(i)).toMap
    val pair = Array.tabulate(n, n)((i, j) => dist(i, j))
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var nextId = n
    while (clusters.size > 1) {
      val ids = clusters.keys.toSeq.sorted
      var best = (Double.MaxValue, -1, -1)
      for (ai <- ids.indices; bi <- ai + 1 until ids.length) {
        val a = ids(ai); val b = ids(bi)
        // complete linkage: max pairwise distance
        val d = clusters(a).flatMap(p => clusters(b).map(q => pair(p)(q))).max
        if (d < best._1) best = (d, a, b)
      }
      val (d, a, b) = best
      val merged = clusters(a) ++ clusters(b)
      merges += Merge(a, b, d, merged.size)
      clusters = clusters - a - b + (nextId -> merged)
      nextId += 1
    }
    merges.toSeq
  }

  /** L20 — PC ↔ metadata association: OLS of each component on each sheet
    * column (categorical → dummies), F-test p-value
    * (visualizations.py:396-533). Driver-side (n_samples rows). */
  def pcAssociations(red: Reduction,
      sheet: Seq[Map[String, String]], labelCol: String,
      columns: Seq[String]): Seq[(Int, String, Double)] = {
    val rows = red.sampleLabels.map(s =>
      sheet.find(_(labelCol) == s).getOrElse(Map.empty))
    for {
      pc <- 0 until red.coords.cols
      c <- columns
    } yield {
      val y = DenseVector((0 until red.coords.rows)
        .map(i => red.coords(i, pc)).toArray)
      val vals = rows.map(_.getOrElse(c, ""))
      val numeric = vals.forall(v => scala.util.Try(v.toDouble).isSuccess)
      val design: DenseMatrix[Double] =
        if (numeric)
          DenseMatrix(vals.map(v => Array(1.0, v.toDouble)): _*)
        else {
          val levels = vals.distinct.sorted.drop(1)
          DenseMatrix(vals.map(v =>
            (1.0 +: levels.map(l => if (v == l) 1.0 else 0.0)).toArray): _*)
        }
      val p = olsFPvalue(design, y)
      (pc, c, p)
    }
  }

  private def olsFPvalue(x: DenseMatrix[Double],
      y: DenseVector[Double]): Double = {
    val n = x.rows; val p = x.cols
    if (n <= p) return Double.NaN
    val beta = breeze.linalg.pinv(x) * y
    val resid = y - x * beta
    val sse = resid dot resid
    val mean = breeze.linalg.sum(y) / n
    val sst = y.toArray.map(v => (v - mean) * (v - mean)).sum
    val dfM = p - 1; val dfE = n - p
    if (dfM <= 0 || sse <= 0) return Double.NaN
    val f = ((sst - sse) / dfM) / (sse / dfE)
    if (f < 0 || f.isNaN) Double.NaN
    else 1.0 - new FDistribution(dfM.toDouble, dfE.toDouble)
      .cumulativeProbability(f)
  }
}
