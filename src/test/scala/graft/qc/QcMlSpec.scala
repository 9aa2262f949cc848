package graft.qc

import graft.SparkSpec
import graft.core.MergeSamples
import graft.ml.Ml
import org.apache.spark.sql.functions._

class QcMlSpec extends SparkSpec {
  import spark.implicits._

  def betas = (for {
    s <- Seq("a1", "a2", "b1", "b2")
    i <- 0 until 50
  } yield {
    // probes 0-9 differ by group; the rest are flat
    val base = if (i < 10 && s.startsWith("b")) 0.8f else 0.3f
    (s, s"cg$i", Some(base + (s.hashCode % 7) * 0.001f))
  }).toDF("sample_label", "probe_id", "beta")

  test("detection rate + intensity summary shapes") {
    val sig = Seq(
      ("s1", "cg1", "II", null: String, "cg", "", Some(10f),
        None: Option[Float], None: Option[Float], Some(20f), Some(0.01f)),
      ("s1", "cg2", "II", null: String, "cg", "", Some(10f),
        None: Option[Float], None: Option[Float], Some(20f), Some(0.5f)))
      .toDF("sample_label", "probe_id", "inf_type", "channel", "probe_type",
        "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")
    val dr = QC.detectionRate(sig, 0.05).head()
    assert(dr.getAs[Double]("detection_rate") == 0.5)
    val is = QC.intensitySummary(sig).head()
    assert(is.getAs[Double]("mean_meth") == 10.0)
    assert(is.getAs[Long]("n_probes") == 2)
  }

  test("most-variable probes are the group-differing ones") {
    val top = QC.mostVariableProbes(betas, 10)
      .collect().map(_.getString(0)).toSet
    assert(top == (0 until 10).map(i => s"cg$i").toSet)
  }

  test("beta state proportions + histogram") {
    val props = QC.betaStateProportions(betas, "sample_label")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pct_hyper")).toMap
    assert(props("b1") > 15 && props("a1") == 0.0)
    val hist = QC.betaHistogram(betas, nBins = 10)
    assert(hist.agg(sum("n")).head().getLong(0) == 200)
  }

  test("replicate std-dev per probe/group matches the closed form") {
    val sheet = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"))
      .toDF("sample_id", "rep_group")
    val stats = QC.replicateStats(betas, sheet, "rep_group",
      sampleLabelCol = "sample_id")
    // golden: two replicates per group → std = |v1 - v2| / sqrt(2)
    val vals = betas.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Float]("beta").toDouble).toMap
    val got = stats.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Double]("beta_std"), r.getAs[Long]("n_replicates"))).toMap
    assert(got.size == 100) // 50 probes × 2 groups
    for (i <- 0 until 50; g <- Seq("A", "B")) {
      val (s1, s2) = if (g == "A") ("a1", "a2") else ("b1", "b2")
      val expected =
        math.abs(vals((s1, s"cg$i")) - vals((s2, s"cg$i"))) / math.sqrt(2)
      val (std, n) = got((s"cg$i", g))
      assert(n == 2L && math.abs(std - expected) < 1e-9,
        s"cg$i/$g: got $std expected $expected")
    }
    // channel labeling joins the probe design string on
    val sig = (0 until 50).map(i =>
      (s"cg$i", if (i % 2 == 0) "I" else "II",
        if (i % 2 == 0) "G" else null))
      .toDF("probe_id", "inf_type", "channel")
    val labeled = QC.replicateStatsByChannel(stats, sig)
    val byLabel = labeled.groupBy("channel_label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel("type I G") == 50L && byLabel("type II ") == 50L)
  }

  test("merge samples by group: averages per probe, sheet type dispatch") {
    val groups = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"))
      .toDF("sample_label", "group_label")
    val merged = MergeSamples.mergeBetas(betas, groups)
    assert(merged.select("sample_label").distinct().count() == 2)
    val a0 = merged.filter($"sample_label" === "A" && $"probe_id" === "cg0")
      .head().getAs[Float]("beta")
    val expected = (0.3f + ("a1".hashCode % 7) * 0.001f +
      0.3f + ("a2".hashCode % 7) * 0.001f) / 2
    assert(math.abs(a0 - expected) < 1e-6)

    val sheet = Seq(("a1", "A", 10.0, true), ("a2", "A", 20.0, false))
      .toDF("sample_label", "grp", "age", "flag")
    val ms = MergeSamples.mergeSheet(sheet, "grp").head()
    assert(ms.getAs[Double]("age") == 15.0)
    assert(ms.getAs[Boolean]("flag"))
    assert(ms.getAs[String]("sample_label") == "a1;a2")
  }

  test("PCA separates the two groups on PC1") {
    val red = Ml.pca(betas, nComponents = 2, nProbes = 20)
    assert(red.sampleLabels == Seq("a1", "a2", "b1", "b2"))
    val pc1 = red.sampleLabels.zipWithIndex
      .map { case (s, i) => s -> red.coords(i, 0) }.toMap
    // groups on opposite sides of 0
    assert(pc1("a1") * pc1("b1") < 0)
    assert(math.signum(pc1("a1")) == math.signum(pc1("a2")))
    assert(red.explainedVarianceRatio.head > 0.9)
  }

  test("MDS and TSVD produce sane coordinates") {
    val mds = Ml.classicalMds(betas, 2, 20)
    assert(mds.coords.rows == 4)
    val pc1 = (0 until 4).map(mds.coords(_, 0))
    assert(pc1.max - pc1.min > 0.1) // groups separated
    val tsvd = Ml.truncatedSvd(betas, 2, 20)
    assert(tsvd.explainedVarianceRatio.head > 0.5)
  }

  test("complete-linkage clustering merges within-group samples first") {
    val (_, _, x) = Ml.topVarianceMatrix(betas, 20)
    val merges = Ml.hierarchicalClustering(x)
    assert(merges.length == 3)
    // first two merges join {a1,a2} and {b1,b2} (distance ≈ 0 within group)
    val first2 = merges.take(2).map(m => Set(m.a, m.b))
    assert(first2.contains(Set(0, 1)) && first2.contains(Set(2, 3)))
    assert(merges.last.size == 4)
  }

  test("PC-metadata association finds the group factor") {
    val sheet = Seq(
      Map("sample_id" -> "a1", "grp" -> "A", "noise" -> "x"),
      Map("sample_id" -> "a2", "grp" -> "A", "noise" -> "y"),
      Map("sample_id" -> "b1", "grp" -> "B", "noise" -> "x"),
      Map("sample_id" -> "b2", "grp" -> "B", "noise" -> "y"))
    val red = Ml.pca(betas, 2, 20)
    val assoc = Ml.pcAssociations(red, sheet, "sample_id",
      Seq("grp", "noise"))
      .map { case (pc, c, p) => (pc, c) -> p }.toMap
    assert(assoc((0, "grp")) < 0.05)
    assert(assoc((0, "noise")) > 0.1)
  }
}
