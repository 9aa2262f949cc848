package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment harness for this optimization round: times the
  * sub-steps of one heavy pipeline in isolation (guide §1 — decide where
  * the time goes before changing anything). Not registered anywhere;
  * numbers land in OPTIMIZATION_r15.md. */
object Poke {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[poke] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def sig = {
      def cell(base: org.apache.spark.sql.Column, m: Int) =
        when($"l_suppkey" % 10 === 7, lit(0f))
          .otherwise(when(
            $"l_orderkey" % 23 === 0 || $"l_orderkey" % m === 0,
            lit(null).cast("float")).otherwise(base.cast("float")))
      Q.t(spark, sfDir, "lineitem").select(
        $"l_suppkey".cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_partkey" % 3 === 0, "II").otherwise("I").as("inf_type"),
        when($"l_partkey" % 2 === 0, "G").otherwise("R").as("channel"),
        lit("cg").as("probe_type"),
        lit("").as("mask_info"),
        cell($"l_quantity", 11).as("meth_g"),
        cell(($"l_orderkey" * 3 + $"l_linenumber") % 47, 13).as("unmeth_g"),
        cell(($"l_orderkey" * 7 + $"l_linenumber") % 53, 17).as("meth_r"),
        cell($"l_tax" * 100, 19).as("unmeth_r"),
        lit(null).cast("float").as("p_value"))
    }

    // warmup pass (codegen/JIT) at sf0.01
    try {
      val (w, _) = graft.prep.Prep.poobah(spark, {
        val d0 = sfDir; val _ = d0
        sig
      }, graft.core.Masks.empty(spark), useNegativeControls = false)
      w.count(); w.unpersist()
    } catch { case e: Throwable => println(s"[poke] warmup: $e") }
    spark.catalog.clearCache(); System.gc()

    // step timings, mirroring Prep.poobah's internals
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sigP = sig.repartition(nPart, col("sample_label"), col("probe_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pin sigP (repartition+persist+count)") { sigP.count() }
    val masked = graft.core.Masks.applyMask(sigP,
      graft.core.Masks.addMask(graft.core.Masks.empty(spark),
        graft.core.Masks.maskNonUniqueProbes(sigP)))
    val bg = graft.prep.Prep.oobCells(masked)
    def chanQuery(ch: String, m: String, u: String) =
      sigP.select(col("sample_label"), col("probe_id"),
        lit(ch).as("channel"), greatest(col(m), col(u)).as("v"))
    val queries = chanQuery("G", "meth_g", "unmeth_g")
      .unionByName(chanQuery("R", "meth_r", "unmeth_r"))
    time("bg cells count") { bg.count() }
    val looked = graft.operators.Ecdf.ecdfLookup(
      queries, bg.select(col("sample_label"), col("channel"),
        col("value").cast("double").as("v")),
      Seq("sample_label", "channel"), "v", "F", bgSumCol = Some("_bg_sum"))
    val perChannel = looked
      .withColumn("p", when(col("v").isNull, lit(null).cast("double"))
        .when(coalesce(col("_bg_sum") <= 100, lit(false)),
          lit(1.0) - least(greatest(floor(col("v")) + 1, lit(0.0)),
            lit(1000.0)) / 1000.0)
        .otherwise(lit(1.0) - col("F")))
    val pv = perChannel.groupBy("sample_label", "probe_id")
      .agg(min(col("p")).cast("float").as("p_value"))
    val pvP = time("pv (ecdf+agg) persist+count") {
      val p = pv.persist(); p.count(); p
    }
    val joined = sigP.drop("p_value")
      .join(pvP, Seq("sample_label", "probe_id"), "left")
    time("join sigP x pv, count only (no persist)") { joined.count() }
    val withP = joined
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("join + PERSIST + count") { withP.count() }
    time("re-count cached withP") { withP.count() }
    spark.stop()
  }
}
