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
      rowId: String, buckets: Int = 8): DataFrame =
    innerWithSalt(skewed, other, key,
      pmod(xxhash64(col(rowId)), lit(buckets.toLong)), buckets)

  /** Portable salt in [0, buckets) from the repo-wide splitmix64 chain
    * over a NUMERIC (long-castable, non-null) row id — bit-identical to
    * the DuckDB UHUGEINT replay in [[graft.queries.DuckOracle.mix]], so
    * a salted join built on it is exact-oracle-checkable (q172). The
    * low-53-bit mask keeps the masked value non-negative in signed
    * arithmetic, making `pmod` agree with the oracle's unsigned modulo.
    * Production callers with string or nullable ids should stay on
    * [[inner]]'s xxhash64 salt. */
  def portableSalt(rowId: Column, buckets: Int): Column =
    pmod(Curation.splitmix(rowId.cast("long"))
      .bitwiseAND(lit((1L << 53) - 1)), lit(buckets.toLong))

  /** [[inner]] with a caller-supplied salt expression over the skewed
    * side (must be a deterministic value in [0, buckets)). */
  def innerWithSalt(skewed: DataFrame, other: DataFrame, key: String,
      saltExpr: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salt = "__salt"
    val l = skewed.withColumn(salt, saltExpr)
    val r = other.withColumn(salt,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, Seq(key, salt)).drop(salt)
  }
}
