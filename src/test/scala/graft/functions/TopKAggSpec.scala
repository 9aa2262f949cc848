package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopKAgg vs a window row_number reference: bounded-heap partial
  * aggregation must produce exactly the k smallest keys per group, across
  * partitions (exercises update/merge/serialize paths — the input is
  * spread over 8 partitions so map-side partials are shuffled). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k payloads equal the k smallest keys per group") {
    val df = spark.range(10000)
      .select(($"id" % 7).as("g"), ($"id" * 2654435761L % 100000).as("v"),
        $"id")
    val got = df.groupBy($"g")
      .agg(TopKAgg.topK(struct($"v", $"id"), struct($"id", $"v"), 5)
        .as("top"))
      .select($"g", posexplode($"top").as(Seq("r", "h")))
      .select($"g", $"r", $"h.id".as("id"), $"h.v".as("v"))
    val want = df.withColumn("r",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"v", $"id")) - 1)
      .filter($"r" < 5)
      .select($"g", $"r".cast("int"), $"id", $"v")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("groups smaller than k return all rows; empty input none") {
    val df = Seq((1L, 3.0), (1L, 1.0), (2L, 9.0)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(TopKAgg.topK(struct($"v"), struct($"v"), 10).as("top"))
      .select($"g", size($"top").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 2, 2L -> 1))
    assert(spark.range(0).select(lit(1.0).as("v")).groupBy()
      .agg(TopKAgg.topK(struct($"v"), struct($"v"), 3).as("t"))
      .select(size($"t")).as[Int].head() === 0)
  }
}
