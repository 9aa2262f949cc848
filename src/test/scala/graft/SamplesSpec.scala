package graft

import graft.core.Schemas.{IdatRow, ManifestRow}
import graft.core.{Masks, SignalBuilder}
import org.apache.spark.sql.functions._

/** The facade's user journey on in-memory fixtures. */
class SamplesSpec extends SparkSpec {
  import spark.implicits._

  def manifest = Seq(
    ManifestRow(10, "cg1", "II", null, "cg", Some(10), None, "1", 100, 102, ""),
    ManifestRow(30, "cg3", "I", "G", "cg", Some(30), Some(31), "X", 300, 302, ""),
    ManifestRow(31, "cg3", "I", "G", "cg", Some(30), Some(31), "X", 300, 302, ""),
    ManifestRow(60, "ctl_Negative_1", "II", null, "ctl", Some(60), None,
      "0", 0, 0, "")
  ).toDF().dropDuplicates("illumina_id")

  def idat = Seq(10, 30, 31, 60).flatMap { id =>
    Seq(IdatRow("s1", "G", id, (id * 10).toFloat, 1f, 5),
      IdatRow("s1", "R", id, (id * 10 + 1).toFloat, 1f, 5))
  }.toDF()

  def samples = Samples(spark,
    SignalBuilder.build(idat, manifest), Masks.empty(spark),
    sheet = Some(Seq(("s1", "A")).toDF("sample_id", "grp")))

  test("selectors filter the long table") {
    assert(samples.type2().count() == 2) // cg1 + control
    assert(samples.type1().count() == 1)
    assert(samples.cgProbes(applyMask = false).count() == 2)
    assert(samples.controls(Some("negative")).count() == 1)
    assert(samples.getProbes(Seq("cg1")).count() == 1)
  }

  test("meth/unmeth named selectors slice the measurement columns (F5)") {
    val m = samples.meth(applyMask = false)
    assert(m.columns.contains("meth_g") && m.columns.contains("meth_r"))
    assert(!m.columns.contains("unmeth_g") && !m.columns.contains("unmeth_r"))
    val u = samples.unmeth(applyMask = false)
    assert(u.columns.contains("unmeth_g") && u.columns.contains("unmeth_r"))
    assert(!u.columns.contains("meth_g") && !u.columns.contains("meth_r"))
    // rows are preserved — it's a column slice, not a filter
    assert(m.count() == samples.signal.count())
    assert(u.count() == samples.signal.count())
  }

  test("mask chaining nulls cells without dropping rows") {
    val masked = samples.maskControlProbes()
    val df = masked.getSignalDf(applyMask = true)
    assert(df.count() == samples.signal.count())
    val ctl = df.filter($"probe_type" === "ctl").head()
    assert(ctl.isNullAt(ctl.fieldIndex("meth_g")))
  }

  test("preprocess chain returns new immutable Samples") {
    val s2 = samples.inferType1Channel().dyeBiasCorrectionL()
    assert(s2.signal.columns.toSeq == samples.signal.columns.toSeq)
    // original untouched
    val orig = samples.signal.filter($"probe_id" === "cg1").head()
    assert(orig.getAs[Float]("meth_g") == 100f)
  }

  test("getBetas with dropNa") {
    val b = samples.getBetas(applyMask = false, dropNa = true)
    assert(b.count() == 3) // cg1, cg3, ctl_Negative_1
    assert(b.filter($"beta".isNull).count() == 0)
  }

  test("save / load round trip") {
    val dir = java.nio.file.Files.createTempDirectory("samples").toString
    samples.maskControlProbes().save(dir)
    val back = Samples.load(spark, dir)
    assert(back.signal.count() == samples.signal.count())
    assert(back.masks.count() > 0)
    assert(back.sheet.isDefined)
  }
}
