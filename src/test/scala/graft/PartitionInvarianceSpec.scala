package graft

/** Partition-count invariance — the property that makes the sf0.01
  * oracle gate meaningful at 100 TB: a registry query must produce
  * IDENTICAL rows whether a stage runs in 3 tasks or 32 (or 10,000 on a
  * cluster). Aggregation-order drift, partition-dependent ids
  * (monotonically_increasing_id in Ranks), per-partition heaps (TopKAgg),
  * partition-offset plans and sort-merge ECDF counts are the failure
  * class this closes.
  *
  * Since r6 the ENTIRE registry is diffed (r5 ran 13 representatives):
  * every query runs under a deliberately tiny shuffle-partition count
  * and its rows are compared against the default-config rows, so a new
  * operator cannot introduce a partition-order dependence unnoticed.
  */
class PartitionInvarianceSpec extends SparkSpec {

  test("every registry query's rows are identical at 3 and 8 shuffle " +
      "partitions") {
    val dir = sf("sf0.001")
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      for (q <- SparkEntry.registry) {
        spark.conf.set(key, "8")
        val base = q.run(spark, dir).collect().toSeq
        spark.conf.set(key, "3")
        val tiny = q.run(spark, dir).collect().toSeq
        assert(base == tiny,
          s"${q.name} rows differ between 8 and 3 shuffle partitions")
        assert(base.nonEmpty, s"${q.name} returned no rows at sf0.001")
      }
    } finally spark.conf.set(key, before)
  }
}
