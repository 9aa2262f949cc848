package graft.ml

import graft.SparkSpec

/** The 14-key dimensionality-reduction dispatcher (reference ml.py:42-45)
  * over a structured synthetic betas table: every key must produce a
  * finite, deterministic (n_samples × k) embedding; the spectral family
  * must agree with each other up to sign; the NMF family must respect
  * non-negativity / simplex constraints. */
class ReductionsSpec extends SparkSpec {
  import spark.implicits._

  // 8 samples × 60 probes; two sample groups separated on many probes
  private lazy val betas = {
    val rows = for {
      s <- 0 until 8
      p <- 0 until 60
    } yield {
      val group = if (s < 4) 0.2 else 0.7
      val v = group + 0.02 * math.sin(p * 2.0 + s) +
        (if (p % 7 == 0) 0.1 * (s % 3) / 3.0 else 0.0)
      (s"s$s", s"cg$p", v.toFloat)
    }
    rows.toDF("sample_label", "probe_id", "beta").cache()
  }

  private def run(model: String) =
    Reductions.dimensionalityReduction(betas, model, nComponents = 2,
      nProbes = 60)

  test("every model key returns a finite deterministic n x 2 embedding") {
    for (m <- Reductions.ModelKeys) {
      val r1 = run(m)
      assert(r1.sampleLabels.length === 8, m)
      assert(r1.coords.rows === 8 && r1.coords.cols === 2, m)
      assert(r1.coords.toArray.forall(v => !v.isNaN && !v.isInfinite),
        s"$m produced non-finite coords")
      val r2 = run(m)
      assert(r1.coords.toArray.toSeq == r2.coords.toArray.toSeq,
        s"$m is nondeterministic")
    }
  }

  test("unknown model key is rejected with the key list") {
    val e = intercept[IllegalArgumentException](run("UMAP"))
    assert(e.getMessage.contains("Known models"))
  }

  test("PCA, IPCA, KPCA(linear) and MDS agree up to component sign") {
    val p = run("PCA").coords
    for (m <- Seq("IPCA", "KPCA", "MDS")) {
      val o = run(m).coords
      for (c <- 0 until 2) {
        val dot = (0 until 8).map(i => p(i, c) * o(i, c)).sum
        val sgn = if (dot >= 0) 1.0 else -1.0
        for (i <- 0 until 8)
          assert(math.abs(p(i, c) - sgn * o(i, c)) < 1e-6,
            s"$m component $c diverges from PCA")
      }
    }
  }

  test("the first component separates the two sample groups") {
    for (m <- Seq("PCA", "FICA", "FA", "SPCA", "NMF")) {
      val c = run(m).coords
      // some component must separate the groups (ICA components are
      // unit-variance and unordered, so "widest" is not meaningful)
      val separates = (0 until 2).exists { j =>
        val g1 = (0 until 4).map(i => c(i, j))
        val g2 = (4 until 8).map(i => c(i, j))
        g1.max < g2.min || g2.max < g1.min
      }
      assert(separates, s"$m does not separate the groups")
    }
  }

  test("NMF embedding is non-negative; LDA rows are simplex") {
    assert(run("NMF").coords.toArray.forall(_ >= 0.0))
    val lda = run("LDA").coords
    for (i <- 0 until 8) {
      val row = (0 until 2).map(j => lda(i, j))
      assert(row.forall(_ >= 0.0))
      assert(math.abs(row.sum - 1.0) < 1e-9)
    }
  }
}
