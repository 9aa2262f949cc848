package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    // block (1, "A"): 3 records -> 3 pairs
    (1L, 1, "A"), (2L, 1, "A"), (3L, 1, "A"),
    // block (1, "B"): 2 records -> 1 pair
    (4L, 1, "B"), (5L, 1, "B"),
    // block (2, "A"): singleton -> no pairs
    (6L, 2, "A")
  ).toDF("id", "nation", "seg")

  test("pairs only form within full blocking keys, ordered id_a < id_b") {
    val pairs = EntityResolution.blockedPairs(
      recs, Seq("nation", "seg"), "id")
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(pairs.columns.toSet == Set("nation", "seg", "a_id", "b_id"))
  }

  test("maxBlock drops oversize blocks (the hot-block quadratic guard)") {
    val pairs = EntityResolution.blockedPairs(
      recs, Seq("nation", "seg"), "id", maxBlock = Some(2))
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((4L, 5L))) // the 3-record block is gone entirely
  }

  test("the blocked join is an equi join, never a cartesian") {
    val p = EntityResolution.blockedPairs(
      recs, Seq("nation", "seg"), "id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }
}
