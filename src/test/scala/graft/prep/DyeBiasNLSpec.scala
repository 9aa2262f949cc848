package graft.prep

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DyeBiasNLSpec extends SparkSpec {
  import spark.implicits._

  test("interp matches np.interp semantics") {
    val xp = Array(1.0, 2.0, 4.0)
    val fp = Array(10.0, 20.0, 40.0)
    assert(DyeBiasNL.interp(1.0, xp, fp) == 10.0)
    assert(DyeBiasNL.interp(3.0, xp, fp) == 30.0)
    assert(DyeBiasNL.interp(1.5, xp, fp) == 15.0)
    assert(DyeBiasNL.interp(0.0, xp, fp) == 10.0) // clamp left
    assert(DyeBiasNL.interp(9.0, xp, fp) == 40.0) // clamp right
  }

  test("quantile normalization maps source ranks onto target distribution") {
    val source = Array(5.0, 1.0, 3.0)
    val target = Array(100.0, 200.0, 300.0)
    // ranks of source: 1→0, 3→1, 5→2 over target quantiles 100/200/300
    val out = DyeBiasNL.quantileNormalizeToTarget(source, target)
    assert(out.toSeq == Seq(300.0, 100.0, 200.0))
    // different sizes: target interpolated on the linspace grid
    val out2 = DyeBiasNL.quantileNormalizeToTarget(
      Array(1.0, 2.0), Array(0.0, 10.0, 20.0, 30.0))
    assert(out2.toSeq == Seq(0.0, 30.0))
  }

  test("channel fit: midpoint curve halves a constant offset") {
    // R = G + 100 everywhere → midpoint moves each channel by 50
    val g = Array.tabulate(200)(i => 1000.0 + 10 * i)
    val r = g.map(_ + 100.0)
    val fitR = DyeBiasNL.fitChannel(r, g)
    val mapped = DyeBiasNL.applyFit(1600.0, fitR)
    assert(math.abs(mapped - 1550.0) < 1.0)
    val fitG = DyeBiasNL.fitChannel(g, r)
    val mappedG = DyeBiasNL.applyFit(1500.0, fitG)
    assert(math.abs(mappedG - 1550.0) < 1.0)
  }

  test("end-to-end: NL dye bias brings channels together; flags distortion") {
    // type I probes, R systematically 2× G
    val rows = (0 until 300).map { i =>
      val ch = if (i % 2 == 0) "G" else "R"
      val base = 1000f + (i / 2) * 10f
      if (ch == "G")
        ("s1", s"cg$i", "I", "G", "cg", "", Some(base), Some(base * 0.1f),
          Some(base * 0.9f), Some(base * 0.1f), None: Option[Float])
      else
        ("s1", s"cg$i", "I", "R", "cg", "", Some(base * 0.2f), Some(base * 2f),
          Some(base * 0.2f), Some(base * 1.8f), None: Option[Float])
    }
    val sig = rows.toDF("sample_label", "probe_id", "inf_type", "channel",
      "probe_type", "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r",
      "p_value")
    val (corrected, maskRows) = DyeBiasNL.dyeBiasCorrectionNL(spark, sig)
    assert(maskRows.count() == 0)
    val med = Prep.ibCells(corrected.filter($"inf_type" === "I"))
      .groupBy("channel").agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // medians should be much closer than the original 2× gap
    val ratio = med("R") / med("G")
    assert(ratio > 0.8 && ratio < 1.3, s"ratio $ratio")
  }
}
