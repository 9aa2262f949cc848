package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable log-linear quantile histograms — the HdrHistogram /
  * DDSketch bucketing idea (Tene's HdrHistogram; Masson et al.,
  * "DDSketch", VLDB 2019) done with INTEGER-EXACT bucket arithmetic so
  * the sketch is bit-identical across engines and parallelism.
  *
  * Bucket index for a non-negative integer x with sub-bucket precision
  * k (power-of-two octaves, 2^k linear sub-buckets per octave):
  *   - x < 2^(k+1)            → idx = x           (exact, width 1)
  *   - else, e = floor(log2 x) → idx = (e-k)·2^k + (x >> (e-k))
  * The index is contiguous and monotone, bucket width is 2^(e-k), so
  * relative error ≤ 2^-k (k=5 → ≤3.1%). Everything is shifts and
  * integer division on BIGINT — no float log whose last-ulp could
  * disagree between engines (the reason this is chosen over DDSketch's
  * ceil(log_γ x) spelling).
  *
  * Scale contract (the reason to sketch at all): per-key state is
  * bounded by the number of distinct buckets (≤ 64·2^k ≈ 2k rows)
  * regardless of how many values stream in; ONE hash shuffle with
  * map-side partial counts builds it; and sketches MERGE by summing
  * counts per bucket, so per-(day, source) histograms roll up to any
  * coarser key without re-touching raw data — the same mergeability
  * contract as [[Hll]] (distincts) and the CMS sketch (frequencies).
  *
  * Reference behavior: percentile summaries like pylluminator's
  * per-sample intensity quantiles (`qc.py` describe()/quantile
  * surfaces); this is their unbounded-stream scale path.
  */
object QuantileHist {

  /** Sub-bucket precision: 2^k linear sub-buckets per octave,
    * relative error ≤ 2^-k ≈ 3.1%. */
  val K = 5
  private val Kl = K.toLong

  /** Bucket index (codegen'd integer ops only); x < 0 clamps to 0. */
  def bucketIdx(x: Column): Column = {
    val xe = greatest(x.cast("long"), lit(0L))
    val e = (length(bin(xe)) - 1).cast("long")
    when(xe < lit(1L << (K + 1)), xe)
      .otherwise((e - Kl) * (1L << K) +
        call_function("shiftright", xe, (e - Kl).cast("int")))
  }

  /** The same index as DuckDB SQL over an integer expression `x`. */
  def bucketIdxSql(x: String): String =
    s"""(CASE WHEN greatest($x, 0) < ${1L << (K + 1)}
          THEN greatest($x, 0)
          ELSE (length(bin(greatest($x, 0))) - 1 - $Kl)
                 * ${1L << K}
               + (greatest($x, 0)
                  >> (length(bin(greatest($x, 0))) - 1 - $Kl))
        END)"""

  /** Integer midpoint estimate for a bucket index (exact for the
    * linear range, bucket-center for octave buckets). */
  def bucketMid(idx: Column): Column = {
    val o = shiftright(idx, K) // = e-k+1 for octave buckets
    val e = o + Kl - 1
    val m = idx - (o - 1) * (1L << K)
    // bucket width 2^(e-k)
    val w = call_function("shiftleft", lit(1L), (e - Kl).cast("int"))
    when(idx < lit(1L << (K + 1)), idx)
      .otherwise(m * w + shiftright(w, 1))
  }

  /** The same midpoint as DuckDB SQL over a bucket-index expression. */
  def bucketMidSql(idx: String): String =
    s"""(CASE WHEN $idx < ${1L << (K + 1)} THEN $idx
          ELSE (($idx) - (($idx >> $K) - 1) * ${1L << K})
                 * (CAST(1 AS BIGINT) << (($idx >> $K) - 1))
               + ((CAST(1 AS BIGINT) << (($idx >> $K) - 1)) >> 1)
        END)"""

  /** Per-key histogram: one row per (keys..., bucket) with its count —
    * the sketch in relational form. ONE shuffle on (keys, bucket);
    * map-side partial sums collapse the raw stream before it moves. */
  def histogram(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.select(keys.map(col) :+ bucketIdx(col(valueCol)).as("bucket"): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histograms to a coarser key set: sum counts per bucket —
    * per-slice sketches roll up without re-touching raw data. */
  def merge(hist: DataFrame, keys: Seq[String]): DataFrame =
    hist.groupBy((keys :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a histogram: for each integer percent p,
    * the midpoint of the first bucket whose cumulative count reaches
    * ceil(p·n/100) (lower interpolation, all-integer ranks). The
    * cumulative window runs over the ≤2k-row SKETCH per key, not the
    * data. Output: keys..., n, p, est. */
  def quantiles(hist: DataFrame, keys: Seq[String], percents: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt"))
        .over(Window.partitionBy(keys.map(col): _*)))
    val ps = percents.map(p => lit(p.toLong)).toArray
    // integer rank: ceil(p·n/100) with no float division
    val rank = call_function("div", col("p") * col("n") + 99L, lit(100L))
    cum
      .select(col("*"), explode(array(ps.toIndexedSeq: _*)).as("p"))
      .filter(col("cum") - col("cnt") < rank && col("cum") >= rank)
      .select(keys.map(col) :+ col("n") :+ col("p") :+
        bucketMid(col("bucket")).as("est"): _*)
  }
}
