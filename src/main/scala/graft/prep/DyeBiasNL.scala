package graft.prep

import graft.functions.StatFuncs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L14 — nonlinear dye-bias correction (reference samples.py:1340-1427 +
  * stats.py:145-167): per sample, quantile-normalize each channel's
  * type-I intensity distribution to the other channel, map every signal
  * through the midpoint curve with np.interp semantics (linear inside the
  * observed range, shifted linear above, proportional below; below-range
  * → NaN when the channel minimum is 0).
  *
  * The per-sample sorted intensity arrays (≤130k values) are collected to
  * the driver and broadcast; the mapping itself is applied distributively
  * per row. Distortion guard: top-20-median ratio vs global-median ratio
  * > 10 → the sample's green probes are masked instead
  * (samples.py:1369-1387).
  */
object DyeBiasNL {

  /** np.interp: piecewise-linear over (xp sorted, fp), clamped at ends. */
  def interp(x: Double, xp: Array[Double], fp: Array[Double]): Double = {
    if (x <= xp(0)) return fp(0)
    if (x >= xp(xp.length - 1)) return fp(fp.length - 1)
    var lo = 0; var hi = xp.length - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xp(mid) <= x) lo = mid else hi = mid
    }
    if (xp(hi) == xp(lo)) fp(hi)
    else fp(lo) + (fp(hi) - fp(lo)) * (x - xp(lo)) / (xp(hi) - xp(lo))
  }

  /** stats.py:145-167 — quantile-normalize source to target: rank each
    * source value, read the target distribution at the same normalized
    * rank (linear interpolation over linspace grids). */
  def quantileNormalizeToTarget(source: Array[Double],
      target: Array[Double]): Array[Double] = {
    val targetSorted = target.sorted
    val n = source.length
    val m = targetSorted.length
    // interp_target[i] = target quantile at i/(n-1)
    val grid = Array.tabulate(n) { i =>
      val q = if (n == 1) 0.0 else i.toDouble / (n - 1)
      val pos = q * (m - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) targetSorted(lo)
      else targetSorted(lo) + (pos - lo) * (targetSorted(hi) - targetSorted(lo))
    }
    // source_ranks = argsort(argsort(source)) (stats.py:158-159)
    val order = source.indices.sortBy(source)
    val ranks = new Array[Int](n)
    order.zipWithIndex.foreach { case (idx, r) => ranks(idx) = r }
    ranks.map(grid)
  }

  final case class ChannelFit(xp: Array[Double], fp: Array[Double],
      maxX: Double, minX: Double, maxMid: Double, minMid: Double)

  /** Build the midpoint mapping for one channel given both channels'
    * sorted in-band intensity arrays (samples.py:1398-1412). */
  def fitChannel(channel: Array[Double],
      reference: Array[Double]): ChannelFit = {
    val sorted = channel.sorted
    val normalized = quantileNormalizeToTarget(sorted, reference).sorted
    val midpoint = sorted.zip(normalized).map { case (a, b) => (a + b) / 2 }
    ChannelFit(sorted, midpoint, sorted.last, sorted.head,
      midpoint.last, midpoint.head)
  }

  /** Apply the fit with the reference's three-branch semantics
    * (samples.py:1414-1424). */
  def applyFit(v: Double, f: ChannelFit): Double =
    if (v.isNaN) v
    else if (v > f.maxX) v - f.maxX + f.maxMid
    else if (v < f.minX)
      if (f.minX == 0) Double.NaN else v * (f.minMid / f.minX)
    else interp(v, f.xp, f.fp)

  /** Run the correction for every sample. Returns (corrected signal,
    * distortion-mask rows for samples that failed the guard). */
  def dyeBiasCorrectionNL(spark: SparkSession,
      signal: DataFrame): (DataFrame, DataFrame) = {
    // per (sample, channel): sorted type-I in-band values
    val cells = Prep.ibCells(signal.filter(col("inf_type") === "I"))
    val arrays: Map[(String, String), Array[Double]] =
      cells.groupBy("sample_label", "channel")
        .agg(sort_array(collect_list(col("value").cast("double"))).as("vs"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          r.getSeq[Double](2).toArray).toMap

    // distortion guard per sample on total type-I in-band intensity
    val totals = Prep.totalIbIntensity(signal.filter(col("inf_type") === "I"))
      .join(signal.filter(col("inf_type") === "I")
        .select("sample_label", "probe_id", "channel").distinct(),
        Seq("sample_label", "probe_id"))
    val totalArrays: Map[(String, String), Array[Double]] =
      totals.groupBy("sample_label", "channel")
        .agg(sort_array(collect_list(col("total_ib").cast("double"))).as("vs"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          r.getSeq[Double](2).toArray).toMap

    val samples = arrays.keys.map(_._1).toSeq.distinct.sorted
    val (fits, distorted) = samples.foldLeft(
      (Map.empty[(String, String), ChannelFit], Seq.empty[String])) {
      case ((fAcc, dAcc), s) =>
        val tR = totalArrays.getOrElse((s, "R"), Array.empty)
        val tG = totalArrays.getOrElse((s, "G"), Array.empty)
        val medR = StatFuncs.median(tR)
        val medG = StatFuncs.median(tG)
        val top20R = StatFuncs.median(tR.sorted.takeRight(20))
        val top20G = StatFuncs.median(tG.sorted.takeRight(20))
        val distortion =
          if (top20G == 0 || medG == 0) Double.NaN
          else (top20R / top20G) / (medR / medG)
        if (distortion.isNaN || distortion > 10) (fAcc, dAcc :+ s)
        else {
          val g = arrays((s, "G")); val r = arrays((s, "R"))
          if (g.isEmpty || r.isEmpty || g.max <= 0 || r.max <= 0) (fAcc, dAcc)
          else (fAcc + (((s, "R")) -> fitChannel(r, g)) +
            (((s, "G")) -> fitChannel(g, r)), dAcc)
        }
    }
    val bcast = spark.sparkContext.broadcast(fits)

    val mapUdf = udf((sample: String, ch: String, v: java.lang.Float) =>
      if (v == null) null
      else bcast.value.get((sample, ch)).map { f =>
        val r = applyFit(v.toDouble, f)
        if (r.isNaN) null else java.lang.Float.valueOf(r.toFloat)
      }.getOrElse(v))

    val corrected = signal
      .withColumn("meth_g", mapUdf(col("sample_label"), lit("G"), col("meth_g")))
      .withColumn("unmeth_g", mapUdf(col("sample_label"), lit("G"), col("unmeth_g")))
      .withColumn("meth_r", mapUdf(col("sample_label"), lit("R"), col("meth_r")))
      .withColumn("unmeth_r", mapUdf(col("sample_label"), lit("R"), col("unmeth_r")))

    import spark.implicits._
    val maskRows = signal.filter(col("inf_type") === "I" &&
      col("channel") === "G")
      .select("probe_id").distinct()
      .crossJoin(distorted.toDF("sample_label"))
      .select(lit("dye bias nl").as("mask_name"), col("sample_label"),
        col("probe_id"))
    (corrected, maskRows)
  }
}
