package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual hot-key salting for equi joins — the fallback when AQE's
  * skew-join can't help: AQE only splits SORT-MERGE join partitions, so
  * a skewed build side that must stay hash-partitioned (or a key so hot
  * that one key exceeds a whole executor) still serializes on one task.
  *
  * Shape: the SKEWED side gets a deterministic salt in [0, buckets)
  * derived from splitmix64 of a unique row id (NOT `rand()` — retries
  * and speculative tasks must re-derive the same salt, and the result
  * must be reproducible run to run); the other side is replicated
  * `buckets` times via `explode(sequence(...))`. Joining on (key, salt)
  * splits each hot key across `buckets` tasks; the output is EXACTLY the
  * plain join's (spec-asserted), the cost is replicating the small side
  * ×buckets — the standard trade.
  */
object SaltedJoin {

  /** Inner equi join of `skewed` × `other` on `key`, with the skewed
    * side fanned over `buckets` salt values. `rowId` must be unique per
    * skewed row (any stable id column, any type — string ids hash fine)
    * — it only seeds the salt. The salt is xxhash64 of the id, not
    * splitmix arithmetic: arithmetic on a non-numeric or null id casts
    * to null, and a null salt would silently DROP the row from the
    * inner join. xxhash64 accepts any type, never returns null, and is
    * deterministic across retries/speculative tasks like splitmix. */
  def inner(skewed: DataFrame, other: DataFrame, key: String,
      rowId: String, buckets: Int = 8): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salt = "__salt"
    val l = skewed.withColumn(salt,
      pmod(xxhash64(col(rowId)), lit(buckets.toLong)))
    val r = other.withColumn(salt,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, Seq(key, salt)).drop(salt)
  }
}
