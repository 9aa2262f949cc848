package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-overhead attribution for the sub-second query cohort (guide §1,
  * §7.3: when wall-clock is not in tasks it is driver-side — planning,
  * AQE re-optimization between materialized stages, action round-trips).
  *
  * For each registered query (optionally filtered by a comma list in
  * arg 0) this runs one warmed, timed pass and splits the wall into:
  *   - construct: time for the registered fn to RETURN the DataFrame
  *     (covers eager work inside operators: collects, checkpoints,
  *     convergence loops);
  *   - action: the .count() the bench times;
  *   - jobs / jobSec: number of Spark jobs and the union of their
  *     [start, end] intervals — time the cluster was actually running;
  *   - gap: wall − jobSec — pure driver time (analysis, optimization,
  *     AQE re-planning, job submission latency);
  *   - tracker phases of the counted plan (parsing/analysis/
  *     optimization/planning) — the first-plan cost only; AQE re-plans
  *     between stages are not in the tracker and land in `gap`.
  *
  *   sbt "runMain graft.DriverProfile q122_pq_adc_topk,q71_dmr_endtoend"
  */
object DriverProfile {
  private final class JobSpans extends SparkListener {
    val spans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      starts.put(e.jobId, e.time)
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val s = starts.getOrDefault(e.jobId, e.time)
      spans.put(e.jobId, (s, e.time))
    }
    def reset(): Unit = { spans.clear(); starts.clear() }
    /** Union of job intervals in seconds (overlapping jobs counted once). */
    def unionSec(): Double = {
      import scala.jdk.CollectionConverters._
      val iv = spans.values.asScala.toVector.sortBy(_._1)
      var total = 0L; var curS = Long.MinValue; var curE = Long.MinValue
      iv.foreach { case (s, e) =>
        if (s > curE) { total += math.max(curE - curS, 0L); curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      total += math.max(curE - curS, 0L)
      total / 1e3
    }
    def count(): Int = spans.size()
  }

  def main(args: Array[String]): Unit = {
    val filter = args.headOption.map(_.split(",").map(_.trim).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // A/B hook: extra/override configs, e.g.
    //   SPARK_GRAFT_EXTRA_CONFS="spark.sql.codegen.cache.maxEntries=10000"
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach { s =>
      s.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new JobSpans
    spark.sparkContext.addSparkListener(jobs)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.contains(n)) }
    // warmup: codegen/JIT once per query shape, like Bench
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache(); System.gc()
    println("query                                   wall  constr  action   jobs  jobSec    gap   parse   analy   optim    plan")
    var tWall = 0.0; var tJob = 0.0; var tGap = 0.0; var tConstr = 0.0
    val rows = ordered.flatMap { case (name, fn) =>
      try {
        jobs.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        Thread.sleep(150) // async listener bus: let tail job-end events land
        val wall = (t2 - t0) / 1e9
        val constr = (t1 - t0) / 1e9
        val action = (t2 - t1) / 1e9
        val jobSec = jobs.unionSec(); val nJobs = jobs.count()
        val gap = wall - jobSec
        import org.apache.spark.sql.catalyst.QueryPlanningTracker._
        val ph = df.queryExecution.tracker.phases
        def p(k: String) = ph.get(k).map(s => (s.endTimeMs - s.startTimeMs) / 1e3).getOrElse(0.0)
        println(f"$name%-38s ${wall}%6.2f ${constr}%7.2f ${action}%7.2f ${nJobs}%6d ${jobSec}%7.2f ${gap}%6.2f ${p(PARSING)}%7.3f ${p(ANALYSIS)}%7.3f ${p(OPTIMIZATION)}%7.3f ${p(PLANNING)}%7.3f")
        tWall += wall; tJob += jobSec; tGap += gap; tConstr += constr
        spark.catalog.clearCache(); System.gc()
        Some((name, wall, gap))
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage}"); None
      }
    }
    println(f"TOTAL wall ${tWall}%.1f s  jobSec ${tJob}%.1f s  gap ${tGap}%.1f s  constr ${tConstr}%.1f s  over ${rows.size} queries")
    println("worst gaps:")
    rows.sortBy(-_._3).take(25).foreach { case (n, w, g) =>
      println(f"  $n%-38s gap ${g}%5.2f of wall ${w}%5.2f")
    }
    spark.stop()
  }
}
