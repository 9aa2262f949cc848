package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches (Flajolet et al. 2007), built
  * entirely from codegen'd column expressions over the shared
  * splitmix64 hash — the canonical 100 TB distinct-counting pattern:
  * per-key state is AT MOST `m = 2^p` small integers regardless of
  * cardinality, and sketches MERGE by element-wise register max, so
  * per-day / per-source register tables roll up to any coarser key
  * without ever re-touching the raw data (same mergeability contract
  * as [[Dedup.groupMinHash]] for Jaccard and the CMS sketch for
  * frequency).
  *
  * Determinism: the register table is pure integers (bucket = top p
  * hash bits, rho = leading-zero rank of the low 64-p bits via
  * `length(bin(...))`, max-merged), and the estimator's harmonic sum
  * uses an exact BIGINT-scaled truncation `2^(40-rho)` (rho > 40
  * contributes 0; the truncation error is ≤ m·2^-41 relative — far
  * below the sketch's own ~1.04/√m standard error — and makes the sum
  * order-independent, so the estimate is bit-identical at any
  * parallelism and exactly replayable in the DuckDB oracle).
  *
  * Reference behavior: distinct-counting surfaces like unique probe /
  * sample censuses (pylluminator `samples.py` idx.nunique() calls);
  * this is their unbounded-cardinality scale path. */
object Hll {

  /** Register precision: m = 2^p buckets, std err ≈ 1.04/√m ≈ 3.3%. */
  val P = 10
  val M: Int = 1 << P // 1024
  /** alpha_m · m² · 2^40 (the harmonic sum is BIGINT-scaled by 2^40),
    * precomputed once so Spark and the SQL oracle share ONE double
    * literal instead of re-deriving it through possibly-divergent
    * constant folding. */
  val AlphaM2Scaled: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble * (1L << 40).toDouble

  /** rho(hash) over the low 64-p bits: position of the leftmost 1-bit
    * (1-based), 64-p+1 when all zero. `bin()` is codegen'd in both
    * engines, so bit width = length(bin(rem)) needs no float log2. */
  private def rho(h: Column): Column = {
    val rem = h.bitwiseAND(lit((1L << (64 - P)) - 1))
    when(rem === 0L, lit(64 - P + 1))
      .otherwise(lit(64 - P + 1) - length(bin(rem)))
  }

  /** Per-key HLL register table: one row per (keys..., bucket) with the
    * max rho observed — the sketch in relational form (≤ m rows per
    * key). ONE hash shuffle on (keys, bucket); map-side partial max
    * collapses the raw stream before it moves. */
  def registers(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val h = Curation.splitmix(col(valueCol))
    df.select(keys.map(col) :+
        shiftrightunsigned(h, 64 - P).cast("long").as("bucket") :+
        rho(h).cast("long").as("rho"): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Merge registers to a coarser key set by element-wise max — the
    * roll-up that makes per-partition / per-day sketches compose
    * without revisiting raw data. */
  def merge(registers: DataFrame, keys: Seq[String]): DataFrame =
    registers.groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Estimate per key from a register table: occupied-bucket census +
    * exact scaled harmonic sum, then the standard HLL estimator with
    * linear-counting small-range correction (E_raw ≤ 2.5m and empty
    * buckets exist → m·ln(m/zeros)). Output floats are row-local
    * functions of exact integers — bit-identical at any parallelism. */
  def estimate(registers: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = registers.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("occupied"),
        sum(expr("CASE WHEN r <= 40 THEN " +
          "shiftleft(CAST(1 AS BIGINT), CAST(40 - r AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END")).as("z_occ"))
    val zScaled = col("z_occ") +
      (lit(M.toLong) - col("occupied")) * lit(1L << 40)
    val estRaw = lit(AlphaM2Scaled) / zScaled.cast("double")
    val zeros = (lit(M.toLong) - col("occupied")).cast("long")
    agg.select(keys.map(col) :+
      col("occupied").cast("long").as("occupied") :+
      zeros.as("zeros") :+
      zScaled.cast("long").as("z_scaled") :+
      (round(when(estRaw <= lit(2.5 * M) && zeros > 0L,
          lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
        .otherwise(estRaw), 6) + lit(0.0)).as("est_distinct"): _*)
  }
}
