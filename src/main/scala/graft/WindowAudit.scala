package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-audit tool for UNPARTITIONED windows (all rows to one task —
  * the single-partition scale smell WindowExec warns about). Two
  * detection layers:
  *   - walks each registered query's executed plan (incl. AQE +
  *     subqueries) and prints GLOBAL-WINDOW hits;
  *   - prints a `>>> name` marker before each query at WARN log level,
  *     so WindowExec warnings from EAGER jobs inside query
  *     construction (percentile cutoffs, rank count jobs, iterative
  *     fits) — whose plans never appear in the returned frame —
  *     correlate to the query that ran them.
  *
  *   sbt "runMain graft.WindowAudit /root/testdata/sf0.001"
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // The WindowExec warning fires at execution, including eager jobs
      // inside query construction — flush a marker first so pane output
      // correlates warnings to the query that caused them.
      println(s"[windowaudit] >>> $name"); Console.flush()
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        var hits = List.empty[String]
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p match {
            case w: WindowExec if w.partitionSpec.isEmpty =>
              hits ::= w.windowExpression.map(_.name).mkString(",")
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case _ =>
          }
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
        }
        walk(plan)
        if (hits.nonEmpty)
          println(s"[windowaudit] GLOBAL-WINDOW $name :: ${hits.distinct.mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[windowaudit] ERR $name ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println("[windowaudit] done")
    spark.stop()
  }
}
