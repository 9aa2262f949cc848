package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query first runs once at sf0.001 (untimed):
  * whole-stage codegen + JIT compile once per query shape, so the timed
  * runs measure steady-state engine throughput, which is what a long-lived
  * cluster actually pays — not single-shot janino/JIT latency.
  *
  * Each query is then timed REPS times at the target SF and the reported
  * per-query number is the MEDIAN (a `queries_min` map carries the mins).
  * Single-shot timings in this sandbox carry ±1 s ambient noise per query,
  * which has repeatedly produced phantom 2-3× "regressions" between rounds;
  * medians over interleaved repetitions make round-to-round deltas
  * attributable to plan changes instead of scheduler weather. */
object Bench {
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated query-name filter for local iteration
    val filter = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.contains(n)) }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // Interleave repetitions (rep-major, query-minor): a transient system
    // hiccup then lands on different queries in different reps, so it is
    // voted out by the median instead of doubling one query's number.
    val samples = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    val failed = scala.collection.mutable.Map.empty[String, String]
    (1 to Reps).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // A failed rep is an ERROR, not a (fast) timing: recording it
        // would fabricate a phantom speedup (r6: q16/q43/q46 "0.1 s"
        // were analysis failures). Keep the sample only on success.
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failed(name) = Option(e.getMessage)
              .getOrElse(e.getClass.getName).take(200)
            false
          }
        if (ok) samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
        // Queries are independent pipelines: drop any frame a query
        // persisted for its own internal reuse (poobah, jaccardDedup
        // return persisted results by contract). Without this the
        // leftovers accumulate across 70 queries × reps, evict each
        // other under storage pressure, and later reps of cache-using
        // queries measure spill/recompute instead of the plan
        // (observed: q59 4.2 s exclusive vs 10 s in-context).
        spark.catalog.clearCache()
        // localCheckpoint blocks (components' per-round labels, the BH
        // rank frames) are NOT SQL caches: their blocks free only when a
        // DRIVER GC collects the dead RDD and the GC-triggered
        // ContextCleaner reaps it (periodicGC defaults to 30 min — never,
        // for a bench). Left alone they fill storage memory and the
        // resulting mid-query eviction storms land on whichever query is
        // running (observed: q59 median 20 s with a 5.2 s min in the same
        // run). One explicit GC at the query boundary keeps the stalls
        // out of the timed windows; it is not counted in any sample.
        System.gc()
      }
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val timed = ordered.filter { case (name, _) => samples(name).nonEmpty }
    val med = timed.map { case (name, _) => name -> median(samples(name)) }
    val mins = timed.map { case (name, _) => name -> samples(name).min }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val failedJson = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = if (med.nonEmpty) med.map(_._2).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(med)},"queries_min":${jmap(mins)},"failed":$failedJson,"reps":$Reps,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only the log TAIL — r6 lost q01-q14's rows to
    // truncation. Persist the full record to disk so no round loses data.
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: $e")
    }
    spark.stop()
  }
}
