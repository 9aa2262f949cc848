package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1998, the consistent-placement scheme behind cache rings and object
  * stores: shard(doc) = argmax over shards s of hash(doc, s). When the
  * shard count grows n → n+1, ONLY the keys whose new argmax IS the new
  * shard move (expected fraction 1/(n+1)); every other key keeps its
  * placement. At 100 TB that is the difference between re-shuffling the
  * whole corpus on a topology change and moving one shard's worth —
  * contrast with mod-n hashing, where growing n relocates (n-1)/n ≈
  * all of the data.
  *
  * The whole assignment is ONE row-local expression (sequence →
  * transform → array_sort → last), no shuffle, no join, codegen'd: the
  * per-shard weights reuse the repo-wide splitmix64 chain and are
  * masked to 53 bits so signed (Spark) and unsigned (DuckDB oracle)
  * comparisons order identically. */
object Sharding {

  private val GammaL = 0x9e3779b97f4a7c15L

  /** HRW shard in [0, n) for a stable integral id column. */
  def rendezvousShard(id: Column, n: Int): Column = {
    require(n >= 1 && n <= 4096, "shard count out of range")
    val base = Curation.splitmix(id)
    val pairs = transform(sequence(lit(0), lit(n - 1)), s =>
      struct(
        Curation.splitmix(base + s.cast("long") * lit(GammaL))
          .bitwiseAND(lit((1L << 53) - 1)).as("w"),
        s.cast("long").as("sh")))
    element_at(array_sort(pairs), n).getField("sh")
  }

  /** Assignment pair under n and n+1 shards plus a movement flag —
    * the resharding-cost surface (expected moved fraction 1/(n+1)). */
  def reshardReport(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("shard_old", rendezvousShard(col(idCol), n))
      .withColumn("shard_new", rendezvousShard(col(idCol), n + 1))
      .withColumn("moved",
        (col("shard_old") =!= col("shard_new")).cast("long"))
}
