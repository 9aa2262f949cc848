package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals the plain join on a hot-key dataset") {
    // one pathological key (90% of rows) + a long tail
    val skewed = spark.range(2000)
      .select($"id",
        when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
        ($"id" * 3).as("payload"))
    val dim = spark.range(50).select($"id".as("k"), ($"id" * 11).as("v"))
    val salted = SaltedJoin.inner(skewed, dim, "k", "id", buckets = 8)
      .select($"id", $"k", $"payload", $"v")
    val plain = skewed.join(dim, "k").select($"id", $"k", $"payload", $"v")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("string and null rowIds salt without dropping rows") {
    // the doc invites 'any stable id column' — a probe-style string id
    // (and even a null id) must not cost the row its join match
    val skewed = spark.range(500)
      .select(
        when($"id" =!= 0, concat(lit("cg"), $"id")).as("probe_id"),
        ($"id" % 5).as("k"), ($"id" * 3).as("payload"))
    val dim = spark.range(5).select($"id".as("k"), ($"id" * 11).as("v"))
    val salted = SaltedJoin.inner(skewed, dim, "k", "probe_id", buckets = 8)
      .select($"probe_id", $"k", $"payload", $"v")
    val plain = skewed.join(dim, "k")
      .select($"probe_id", $"k", $"payload", $"v")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt spreads the hot key across buckets deterministically") {
    val skewed = spark.range(1000)
      .select($"id", lit(1L).as("k"))
      .withColumn("salt", pmod(xxhash64($"id"), lit(8L)))
    val spread = skewed.groupBy($"salt").count().collect()
    assert(spread.length == 8)                   // every bucket hit
    assert(spread.map(_.getLong(1)).max < 1000)  // no bucket owns it all
    // determinism: same ids → same salts on a re-derivation
    val again = spark.range(1000)
      .select($"id", pmod(xxhash64($"id"), lit(8L)).as("salt2"))
    val joined = skewed.join(again, "id")
      .filter($"salt" =!= $"salt2").count()
    assert(joined == 0)
  }
}
