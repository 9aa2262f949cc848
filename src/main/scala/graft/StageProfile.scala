package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one registered query (guide §1/§7: decide
  * whether time goes to shuffle read, executor compute, or scheduling
  * before touching anything). Runs the query twice — an untimed warmup
  * (codegen/JIT) and a timed pass — and prints one line per stage of the
  * timed pass: wall-clock of the stage, summed task time, shuffle
  * read/write bytes, records, and the first line of the stage's callsite
  * so the stage maps back to an operator.
  *
  *   sbt "runMain graft.StageProfile q59_poobah_slice /root/testdata/sf0.1"
  */
object StageProfile {
  private final case class StageRow(id: Int, attempt: Int, name: String,
      wallMs: Long, taskMs: Long, gcMs: Long, shufReadMb: Double,
      shufWriteMb: Double, inputMb: Double, records: Long, tasks: Int)

  private final class Collector extends SparkListener {
    val rows = new scala.collection.mutable.ArrayBuffer[StageRow]
    @volatile var enabled = false
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      if (!enabled) return
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for {
        a <- si.completionTime; b <- si.submissionTime
      } yield a - b).getOrElse(0L)
      rows += StageRow(si.stageId, si.attemptNumber(), si.name,
        wall, m.executorRunTime, m.jvmGCTime,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.inputMetrics.bytesRead / 1048576.0,
        m.inputMetrics.recordsRead, si.numTasks)
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val collector = new Collector
    spark.sparkContext.addSparkListener(collector)
    val fn = SparkEntry.queries(name)
    // warmup at the bench's warm dir (codegen/JIT), mirrors Bench
    try fn(spark, "/root/testdata/sf0.01").count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    System.gc()
    spark.sparkContext.setJobDescription(s"profile: $name")
    collector.enabled = true
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    collector.enabled = false
    // listener bus is async; give the tail events a moment
    Thread.sleep(500)
    val rows = collector.rows.toVector.sortBy(-_.taskMs)
    println(f"[profile] $name: $n rows, $sec%.2f s wall, " +
      f"${rows.size} stages, sum stage wall ${rows.map(_.wallMs).sum / 1e3}%.2f s, " +
      f"sum task time ${rows.map(_.taskMs).sum / 1e3}%.2f s")
    rows.take(40).foreach { r =>
      println(f"[stage ${r.id}%4d] wall ${r.wallMs / 1e3}%6.2f s  task ${r.taskMs / 1e3}%7.2f s  " +
        f"gc ${r.gcMs / 1e3}%5.2f s  sr ${r.shufReadMb}%8.1f MB  sw ${r.shufWriteMb}%8.1f MB  " +
        f"in ${r.inputMb}%8.1f MB  rec ${r.records}%10d  tasks ${r.tasks}%4d  ${r.name.linesIterator.next().take(90)}")
    }
    // per-operator SQL metrics of the timed executions (guide §7.1's SQL
    // tab, read programmatically): one line per plan node with its
    // time-like metrics, so stage CPU maps to a specific operator
    val store = spark.sharedState.statusStore
    store.executionsList().filter(_.description.contains("profile:"))
      .foreach { e =>
        val metrics = store.executionMetrics(e.executionId)
        println(s"[sql exec ${e.executionId}]")
        val graph = store.planGraph(e.executionId)
        graph.allNodes.foreach { node =>
          val interesting = node.metrics
            .filter(m => metrics.contains(m.accumulatorId))
            .map(m => s"${m.name}=${metrics(m.accumulatorId)
              .replace("\n", " ")}")
          if (interesting.nonEmpty)
            println(s"  [node ${node.id}] ${node.name}: " +
              interesting.mkString(" | "))
        }
      }
    spark.stop()
  }
}
