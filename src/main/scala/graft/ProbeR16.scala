package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 scratch probe: bisect q162's per-row expression cost (61 rows,
  * ~1.4 s of task time in one stage — ~23 ms/row through a chain of
  * sequence/transform + the EnergyProfile64/AHash64 codegen kernels).
  * Times each prefix of the chain separately on the same 61 ids.
  * Not registered; measurement tooling like Poke/StageProfile. */
object ProbeR16 {
  def time[T](label: String, reps: Int = 3)(f: => T): Unit = {
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"[probe] $label%-52s ${best}%7.3f s (best of $reps)")
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

    val smp = """transform(
        sequence(0, 31 + CAST((id * 7) % 400 AS INT)),
        i -> CAST(((id * 31 + i * 17) % 512) - 256 AS DOUBLE) / 256.0D)"""

    // the q162 base: anchored part ids <= 60
    def base = Q.anchorKey(Q.t(spark, sfDir, "part"), "p_partkey")
      .filter($"p_partkey" <= 60)
      .select($"p_partkey".as("id"))
    // synthetic 61 ids, no parquet/broadcast in sight
    def syn = spark.range(0, 61).select($"id")

    def chain(b: org.apache.spark.sql.DataFrame, label: String): Unit = {
      time(s"$label ids only") { b.write.format("noop").mode("overwrite").save() }
      time(s"$label + samples") {
        b.select($"id", expr(smp).as("samples"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$label + size") {
        b.select($"id", expr(smp).as("samples"))
          .select($"id", size($"samples").cast("long").as("n_samples"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$label + energyProfile64") {
        b.select($"id", expr(smp).as("samples"))
          .select($"id",
            graft.functions.Expressions.energyProfile64($"samples").as("lv"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$label + profile + aHash") {
        b.select($"id", expr(smp).as("samples"))
          .select($"id",
            graft.functions.Expressions.energyProfile64($"samples").as("lv"))
          .select($"id", graft.operators.Phash.aHash64("lv", 8, 8).as("fp"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$label + profile + aHash + explode") {
        val prof = b.select($"id", expr(smp).as("samples"))
          .select($"id", size($"samples").cast("long").as("n_samples"),
            graft.functions.Expressions.energyProfile64($"samples").as("lv"))
        prof.select($"id", $"n_samples",
            graft.operators.Phash.aHash64("lv", 8, 8).as("fp"),
            posexplode($"lv").as(Seq("seg", "p")))
          .select($"id", $"n_samples", $"seg".cast("long").as("seg"),
            $"p", expr("shiftright(fp, seg) & 1").as("bit"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$label full q162 (with orderBy, count)") {
        val fn = SparkEntry.queries("q162_audio_fingerprint")
        if (label == "base") fn(spark, sfDir).count() else ()
      }
    }
    // warmup both shapes once (codegen/JIT)
    chain(syn, "warm-syn")
    chain(base, "warm-base")
    println("--- timed ---")
    chain(syn, "syn")
    chain(base, "base")

    // plan + codegen dumps for the hot variant (and the fast control)
    def explodeChain(b: org.apache.spark.sql.DataFrame) = {
      val prof = b.select($"id", expr(smp).as("samples"))
        .select($"id", size($"samples").cast("long").as("n_samples"),
          graft.functions.Expressions.energyProfile64($"samples").as("lv"))
      prof.select($"id", $"n_samples",
          graft.operators.Phash.aHash64("lv", 8, 8).as("fp"),
          posexplode($"lv").as(Seq("seg", "p")))
        .select($"id", $"n_samples", $"seg".cast("long").as("seg"),
          $"p", expr("shiftright(fp, seg) & 1").as("bit"))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/q162_base_explode_plan.txt"),
      explodeChain(base).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/q162_syn_explode_plan.txt"),
      explodeChain(syn).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
