package graft.operators

import graft.SparkSpec
import graft.prep.DyeBiasNL
import org.apache.spark.sql.functions._

/** Distributed np.interp vs the binary-search reference
  * (DyeBiasNL.interp), including duplicated knot x values (last tied knot
  * wins), out-of-range clamping, nulls, and knotless groups. */
class InterpSpec extends SparkSpec {
  import spark.implicits._

  test("interpLookup matches the scalar reference incl ties and clamps") {
    val xp = Array(1.0, 2.0, 2.0, 5.0, 9.0)
    val fp = Array(10.0, 20.0, 22.0, 50.0, 90.0)
    val knots = xp.zip(fp).toSeq.map { case (x, f) => ("a", x, f) }
      .toDF("g", "xp", "fp")
    val qs = Seq(("a", Some(0.5)), ("a", Some(1.0)), ("a", Some(2.0)),
      ("a", Some(3.5)), ("a", Some(9.0)), ("a", Some(12.0)),
      ("a", None), ("b", Some(1.0))).toDF("g", "x")
    val got = Interp.interpLookup(qs, knots, Seq("g"), "x", "f")
      .as[(String, Option[Double], Option[Double])].collect()
    got.foreach { case (g, x, f) =>
      val want =
        if (g != "a") None
        else x.map(v => DyeBiasNL.interp(v, xp, fp))
      assert(f === want, s"g=$g x=$x")
    }
    assert(got.length === 8)
  }

  test("distributed NL dye-bias fit equals the local fitChannel curve") {
    // two channels with distinct distributions; compare the distributed
    // knot frame against fitChannel on collected arrays
    val rows = (0 until 120).flatMap { i =>
      Seq(("s1", "G", 100.0 + 3 * i), ("s1", "R", 250.0 + 5 * i))
    }
    val cellsG = rows.filter(_._2 == "G").map(_._3).toArray
    val cellsR = rows.filter(_._2 == "R").map(_._3).toArray
    val fitG = DyeBiasNL.fitChannel(cellsG, cellsR)
    // drive dyeBiasCorrectionNL via a synthetic signal frame: type-I
    // in-band cells for G are (meth_g, unmeth_g) of channel-G rows
    val sig = rows.zipWithIndex.map { case ((s, ch, v), i) =>
      if (ch == "G")
        (s, s"p$i", "I", "G", "cg", "", Some(v.toFloat), None: Option[Float],
          Some(v.toFloat), None: Option[Float], None: Option[Float])
      else
        (s, s"p$i", "I", "R", "cg", "", None: Option[Float], Some(v.toFloat),
          None: Option[Float], Some(v.toFloat), None: Option[Float])
    }.toDF("sample_label", "probe_id", "inf_type", "channel", "probe_type",
      "mask_info", "meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")
    val (corrected, masks) = DyeBiasNL.dyeBiasCorrectionNL(spark, sig)
    assert(masks.count() === 0)
    // every corrected G value must equal applyFit of the local fit
    // (in-band G values appear twice in cells — meth_g and unmeth_g — so
    // the distributed fit is built on the duplicated multiset; rebuild
    // the local fit the same way)
    val dupG = (cellsG ++ cellsG).sorted
    val dupR = (cellsR ++ cellsR).sorted
    val fitG2 = DyeBiasNL.fitChannel(dupG, dupR)
    val got = corrected.filter($"channel" === "G")
      .select($"probe_id", $"meth_g").collect()
      .map(r => r.getString(0) -> r.getFloat(1)).toMap
    rows.zipWithIndex.filter(_._1._2 == "G").foreach { case ((_, _, v), i) =>
      val want = DyeBiasNL.applyFit(v, fitG2).toFloat
      assert(math.abs(got(s"p$i") - want) <= math.abs(want) * 1e-6f,
        s"p$i: got ${got(s"p$i")} want $want")
    }
  }
}
