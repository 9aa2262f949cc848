package graft

import org.apache.spark.sql.functions._

/** Gates for [[WindowAudit.auditPlan]] — the plan walker must catch the
  * two scale-killer window shapes and stay silent on the fixed plans.
  *
  *   - GLOBAL-WINDOW: empty partitionSpec (all rows to one task).
  *   - BCAST-KEY-WINDOW: a window partitioned ONLY by columns that come
  *     from the broadcast side of a join below it — the r7 q122 shape,
  *     where the partition count is the tiny broadcast cardinality and
  *     each partition holds an entire big-side scan.
  */
class WindowAuditSpec extends SparkSpec {
  import org.apache.spark.sql.expressions.Window

  private def audit(df: org.apache.spark.sql.DataFrame): Seq[String] =
    WindowAudit.auditPlan(df.queryExecution.executedPlan)

  test("flags a window with no partition keys") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .withColumn("r", row_number().over(Window.orderBy("x")))
    val hits = audit(df)
    assert(hits.exists(_.startsWith("GLOBAL-WINDOW")), hits.mkString("|"))
  }

  test("flags the q122-class shape: per-query window over a " +
      "broadcast-crossed corpus") {
    import spark.implicits._
    val corpus = (1 to 1000).map(i => (i.toLong, i * 0.5)).toDF("id", "score")
    val queries = (1 to 3).map(_.toLong).toDF("query_id")
    // the r7 anti-pattern: every query's whole scored corpus lands in
    // ONE task because the window partitions on the broadcast key
    val bad = corpus.crossJoin(broadcast(queries))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy("score", "id")))
      .filter(col("rank") <= 10)
    val hits = audit(bad)
    assert(hits.exists(_.startsWith("BCAST-KEY-WINDOW")), hits.mkString("|"))
  }

  test("does NOT flag a window partitioned by a big-side key") {
    import spark.implicits._
    val corpus = (1 to 1000).map(i => (i.toLong, i % 7, i * 0.5))
      .toDF("id", "grp", "score")
    val dim = (0 to 6).map(g => (g, s"g$g")).toDF("grp", "label")
    val ok = corpus.join(broadcast(dim), "grp")
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy("score")))
    // grp flows through the broadcast join but ORIGINATES on the
    // stream (corpus) side: partition count scales with the data.
    assert(audit(ok).isEmpty, audit(ok).mkString("|"))
  }

  test("the fixed q122 plan is clean (bounded-heap top-k, no " +
      "per-query window)") {
    val df = graft.queries.SimilarityQ.q122.run(spark, sf("sf0.001"))
    val hits = audit(df)
    assert(hits.isEmpty, hits.mkString("|"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "expected an aggregate-based top-k\n" + p.take(2000))
  }
}
