package graft.batch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CombatSpec extends SparkSpec {
  import spark.implicits._

  // 2 batches × 3 samples, 60 probes; batch2 shifted +2 and scaled ×2 in
  // m-value space; a real group effect (probes 0-19 higher in samples
  // *_g2 of both batches) must survive correction
  def mvalues = {
    val rnd = new scala.util.Random(11)
    (for {
      b <- Seq("batch1", "batch2")
      si <- 0 until 3
      i <- 0 until 60
    } yield {
      val s = s"${b}_s$si"
      val groupEffect = if (i < 20 && si == 2) 1.5 else 0.0
      val base = -1.0 + 0.05 * i + groupEffect + rnd.nextGaussian() * 0.1
      val v = if (b == "batch2") base * 2.0 + 2.0 else base
      (s, f"cg$i%03d", v)
    }).toDF("sample_label", "probe_id", "m_value")
  }

  def batches = Seq(
    ("batch1_s0", "batch1"), ("batch1_s1", "batch1"), ("batch1_s2", "batch1"),
    ("batch2_s0", "batch2"), ("batch2_s1", "batch2"), ("batch2_s2", "batch2"))
    .toDF("sample_label", "batch")

  test("combat removes batch location/scale, keeps biological signal") {
    val corrected = Combat.combat(spark, mvalues, batches).cache()
    val byBatch = corrected.join(batches, "sample_label")
      .groupBy("batch")
      .agg(avg("m_value").as("mean"), stddev_samp("m_value").as("sd"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean"), r.getAs[Double]("sd"))).toMap
    // batch means pulled together (before: ~0.5 vs ~3.0)
    assert(math.abs(byBatch("batch1")._1 - byBatch("batch2")._1) < 0.3,
      s"means ${byBatch}")
    // batch scales pulled together (before: sd ratio ≈ 2)
    val sdRatio = byBatch("batch2")._2 / byBatch("batch1")._2
    assert(sdRatio > 0.6 && sdRatio < 1.6, s"sd ratio $sdRatio")

    // biological contrast survives: s2 vs s0/s1 on probes 0-19
    val g = corrected.filter($"probe_id" < "cg020")
      .withColumn("grp", when($"sample_label".endsWith("s2"), "hi")
        .otherwise("lo"))
      .groupBy("grp").agg(avg("m_value").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g("hi") - g("lo") > 0.8, s"group effect ${g}")
  }

  test("single batch is a near no-op") {
    val oneBatch = batches.withColumn("batch", lit("b"))
    val corrected = Combat.combat(spark, mvalues, oneBatch)
    val drift = corrected.withColumnRenamed("m_value", "after")
      .join(mvalues, Seq("sample_label", "probe_id"))
      .select(max(abs($"after" - $"m_value"))).head().getDouble(0)
    // EB shrinkage toward the (single) batch prior is bounded
    assert(drift < 0.5, s"drift $drift")
  }

  test("beta round trip stays in [0,1]") {
    val betas = graft.core.SignalBuilder.mValuesToBetas(
      mvalues.withColumnRenamed("m_value", "m_value"))
    val corrected = Combat.batchCorrectBetas(spark, betas, batches)
    val mm = corrected.agg(min("beta"), max("beta")).head()
    assert(mm.getFloat(0) >= 0f && mm.getFloat(1) <= 1f)
  }
}
