package graft.prep

import graft.SparkSpec
import graft.core.Masks
import graft.functions.StatFuncs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preprocessing semantics on a deterministic synthetic array: 150 type I
  * probes per channel + 100 type II + negative controls — big enough for
  * NOOB's ≥100-background guard and stable ECDFs. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG so the fixture never changes
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map(s => ((s >>> 33).toDouble % 1000.0 + 1000.0) % 1000.0)

  def signal: DataFrame = {
    val r = lcg(42L)
    def nx(lo: Double, hi: Double): Float =
      (lo + (hi - lo) * (r.next() / 1000.0)).toFloat
    val t1g = (0 until 150).map { i =>
      ("s1", s"cg_g$i", "I", "G", "cg", "",
        Some(nx(3000, 6000)), Some(nx(100, 400)), // meth_g, meth_r (oob)
        Some(nx(2000, 5000)), Some(nx(100, 400)), // unmeth_g, unmeth_r (oob)
        None: Option[Float])
    }
    val t1r = (0 until 150).map { i =>
      ("s1", s"cg_r$i", "I", "R", "cg", "",
        Some(nx(100, 400)), Some(nx(3000, 6000)),
        Some(nx(100, 400)), Some(nx(2000, 5000)), None: Option[Float])
    }
    val t2 = (0 until 100).map { i =>
      ("s1", s"cg_t$i", "II", null: String, "cg", "",
        Some(nx(1000, 8000)), None: Option[Float],
        None: Option[Float], Some(nx(1000, 8000)), None: Option[Float])
    }
    val neg = (0 until 30).map { i =>
      ("s1", s"ctl_Negative_$i", "II", null: String, "ctl", "",
        Some(nx(80, 300)), None: Option[Float],
        None: Option[Float], Some(nx(80, 300)), None: Option[Float])
    }
    val norm = Seq(
      ("s1", "ctl_norm_c_1", "II", null: String, "ctl", "",
        Some(4000f), None: Option[Float], None: Option[Float],
        Some(100f), None: Option[Float]),
      ("s1", "ctl_norm_a_1", "II", null: String, "ctl", "",
        Some(100f), None: Option[Float], None: Option[Float],
        Some(5000f), None: Option[Float]))
    (t1g ++ t1r ++ t2 ++ neg ++ norm).toDF("sample_label", "probe_id",
      "inf_type", "channel", "probe_type", "mask_info", "meth_g", "meth_r",
      "unmeth_g", "unmeth_r", "p_value")
  }

  lazy val sig = signal.cache()
  lazy val noMasks = Masks.empty(spark)

  test("infer type-I channel: manifest mismatches get switched") {
    // craft: one probe labeled G whose R signal dominates
    val flipped = Seq(("s1", "cg_flip", "I", "G", "cg", "",
      Some(150f), Some(5000f), Some(160f), Some(4500f), None: Option[Float]))
      .toDF("sample_label", "probe_id", "inf_type", "channel", "probe_type",
        "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")
    val (updated, _) = Prep.inferType1Channel(sig.unionByName(flipped))
    val ch = updated.filter($"probe_id" === "cg_flip").head()
      .getAs[String]("channel")
    assert(ch == "R")
    // well-behaved G probes stay G
    val g0 = updated.filter($"probe_id" === "cg_g0").head()
      .getAs[String]("channel")
    assert(g0 == "G")
  }

  test("channel-switch summary counts probes per (manifest, inferred)") {
    // fixture: 150 G probes with G-dominant signal, 150 R probes with
    // R-dominant signal, plus one mislabeled G probe whose R dominates
    val flipped = Seq(("s1", "cg_flip2", "I", "G", "cg", "",
      Some(150f), Some(5000f), Some(160f), Some(4500f), None: Option[Float]))
      .toDF("sample_label", "probe_id", "inf_type", "channel", "probe_type",
        "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")
    val m = Prep.channelSwitchSummary(sig.unionByName(flipped))
      .collect()
      .map(r => (r.getAs[String]("manifest_channel"),
        r.getAs[String]("inferred_channel")) -> r.getAs[Long]("n_probes"))
      .toMap
    assert(m((("G"), ("G"))) == 150L)
    assert(m((("R"), ("R"))) == 150L)
    assert(m((("G"), ("R"))) == 1L) // the mislabeled probe
    assert(!m.contains(("R", "G")))
    // type II probes are excluded entirely
    assert(m.values.sum == 301L)
  }

  test("linear dye bias equalizes channel medians toward the reference") {
    val before = Prep.ibCells(sig.filter($"inf_type" === "I"))
      .groupBy("channel").agg(expr("percentile(value, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val corrected = Prep.dyeBiasCorrectionL(sig)
    val after = Prep.ibCells(corrected.filter($"inf_type" === "I"))
      .groupBy("channel").agg(expr("percentile(value, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // after scaling, both channel medians ≈ the same reference value
    assert(math.abs(after("G") - after("R")) / after("G") < 0.05)
    assert(math.abs(before("G") - before("R")) > 0) // was actually skewed
  }

  test("scrub subtracts the OOB median and clips at 1") {
    val med = Prep.oobCells(sig).groupBy("channel")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scrubbed = Prep.scrubBackgroundCorrection(sig)
    val probe = sig.filter($"probe_id" === "cg_g0").head()
    val got = scrubbed.filter($"probe_id" === "cg_g0").head()
    val expected = math.max(
      probe.getAs[Float]("meth_g") - med("G"), 1.0).toFloat
    assert(math.abs(got.getAs[Float]("meth_g") - expected) < 0.01)
    // oob cells can go to the floor of 1
    val floorCount = scrubbed.filter($"meth_r" === 1f ||
      $"unmeth_r" === 1f).count()
    assert(floorCount > 0)
  }

  test("scrub preserves NULL cells (np.clip(NaN) is NaN, not 1)") {
    val withNull = Seq(("s1", "cg_null", "I", "G", "cg", "",
      None: Option[Float], Some(500f), Some(120f), Some(400f),
      None: Option[Float]))
      .toDF("sample_label", "probe_id", "inf_type", "channel",
        "probe_type", "mask_info", "meth_g", "meth_r", "unmeth_g",
        "unmeth_r", "p_value")
    val scrubbed = Prep.scrubBackgroundCorrection(sig.unionByName(withNull))
      .filter($"probe_id" === "cg_null").head()
    // the NULL meth_g must STAY NULL — an unguarded greatest(NULL - bg, 1)
    // would resurrect it as 1.0 (samples.py:1527 clips NaN to NaN)
    assert(scrubbed.isNullAt(scrubbed.fieldIndex("meth_g")))
    // sibling non-null cells on the same row are still scrubbed
    assert(!scrubbed.isNullAt(scrubbed.fieldIndex("unmeth_g")))
  }

  test("NOOB: corrected values ≈ offset + positive signal; order kept") {
    val corrected = Prep.noobBackgroundCorrection(spark, sig, noMasks)
    val pairs = sig.select($"probe_id", $"meth_g".as("before"))
      .join(corrected.select($"probe_id", $"meth_g".as("after")), "probe_id")
      .filter($"before".isNotNull)
      .collect().map(r => (r.getAs[Float]("before"), r.getAs[Float]("after")))
    assert(pairs.nonEmpty)
    // all corrected values ≥ offset (15) + floor
    assert(pairs.forall(_._2 >= 15f))
    // monotone: higher raw → higher corrected (convolution is monotone)
    val sorted = pairs.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, a1), (_, a2)) =>
      a2 >= a1 - 0.01f })
    // strong signal barely changes (bg subtraction ≈ mu + var/alpha ≈ bg level)
    val strong = pairs.filter(_._1 > 5000)
    assert(strong.forall { case (b, a) => a < b && a > b - 600 })
  }

  test("NOOB skips when background is too small") {
    val tiny = sig.limit(20)
    assert(Prep.noobFits(tiny, noMasks).isEmpty)
    // and the correction is then the identity
    val out = Prep.noobBackgroundCorrection(spark, tiny, noMasks)
    assert(out.collect().toSet == tiny.collect().toSet)
  }

  test("pOOBAH p-values match a manual ECDF computation") {
    val (withP, maskRows) = Prep.poobah(spark, sig, noMasks,
      useNegativeControls = true, threshold = 0.05)
    // manual: background G = oob G cells + neg controls G
    val bgG = (Prep.oobCells(sig).filter($"channel" === "G")
      .select("value").collect().map(_.getFloat(0).toDouble) ++
      Prep.negControlCells(sig).filter($"channel" === "G")
        .select("value").collect().map(_.getFloat(0).toDouble)).sorted
    val bgR = (Prep.oobCells(sig).filter($"channel" === "R")
      .select("value").collect().map(_.getFloat(0).toDouble) ++
      Prep.negControlCells(sig).filter($"channel" === "R")
        .select("value").collect().map(_.getFloat(0).toDouble)).sorted
    val row = withP.filter($"probe_id" === "cg_g0").head()
    val maxG = math.max(row.getAs[Float]("meth_g"),
      row.getAs[Float]("unmeth_g")).toDouble
    val maxR = math.max(row.getAs[Float]("meth_r"),
      row.getAs[Float]("unmeth_r")).toDouble
    val pg = 1.0 - StatFuncs.ecdfCount(bgG, maxG).toDouble / bgG.length
    val pr = 1.0 - StatFuncs.ecdfCount(bgR, maxR).toDouble / bgR.length
    val expected = math.min(pg, pr).toFloat
    assert(math.abs(row.getAs[Float]("p_value") - expected) < 1e-6)
    // strong in-band probes are detected (p = 0 vs background)
    val strongP = withP.filter($"probe_id" === "cg_t0").head()
      .getAs[Float]("p_value")
    assert(strongP <= 0.05f)
    assert(maskRows.columns.toSeq ==
      Seq("mask_name", "sample_label", "probe_id"))
  }
}
