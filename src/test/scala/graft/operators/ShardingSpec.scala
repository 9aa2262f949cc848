package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 20000L).toDF("id")

  test("HRW shards are in range and roughly balanced") {
    val counts = ids
      .select(Sharding.rendezvousShard($"id", 8).as("sh"))
      .groupBy($"sh").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet.subsetOf((0L until 8L).toSet))
    assert(counts.size == 8)
    val exp = 20000.0 / 8
    counts.values.foreach(c => assert(math.abs(c - exp) / exp < 0.10,
      s"shard imbalance: $counts"))
  }

  test("growing n -> n+1 moves keys ONLY onto the new shard " +
      "(the minimal-movement property), ~1/(n+1) of them") {
    val rep = Sharding.reshardReport(ids, "id", 8)
    val movedTo = rep.filter($"moved" === 1L)
      .select($"shard_new").distinct().as[Long].collect().toSeq
    assert(movedTo == Seq(8L),
      s"moved keys must all land on the new shard, got $movedTo")
    val frac = rep.agg(sum($"moved").cast("double") / count(lit(1)))
      .as[Double].head()
    assert(math.abs(frac - 1.0 / 9) < 0.02, s"moved fraction $frac")
  }

  test("assignment is deterministic and independent of extra shards' " +
      "weights for unmoved keys") {
    val a = ids.select($"id", Sharding.rendezvousShard($"id", 8).as("s8"),
      Sharding.rendezvousShard($"id", 12).as("s12"))
    // every key whose s12 < 8 must have kept its n=8 assignment
    assert(a.filter($"s12" < 8 && $"s12" =!= $"s8").count() == 0)
  }
}
