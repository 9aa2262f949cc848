package graft

import org.apache.spark.sql.functions._

/** Smoke + contract tests for the driver-facing registry. */
class QueriesSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique") {
    val qNames = SparkEntry.registry.map(_.name)
    assert(qNames.distinct.length == qNames.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run non-empty at sf0.001") {
    val d = sf("sf0.001")
    for (q <- SparkEntry.registry) {
      val n = q.run(spark, d).count()
      assert(n > 0, s"${q.name} returned 0 rows at sf0.001")
    }
  }
}
