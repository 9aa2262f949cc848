package graft.cnv

import breeze.linalg.{inv, DenseMatrix, DenseVector}
import graft.operators.Intervals
import graft.prep.Prep
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-number variation (SURVEY.md §2.11 L5-L8; reference
  * pylluminator/cnv.py).
  *
  * L5 — per-target regression of total intensity on the normalization
  * samples' intensities: the feature count k = #norm samples is tiny, so
  * the normal equations are assembled DISTRIBUTEDLY as one aggregation of
  * sums/cross-products (Gram matrix), solved on the driver, and the
  * prediction + log2 ratio applied as column arithmetic. No per-row
  * driver work, one shuffle.
  *
  * L6 — binning: 50 kb genome tiles − assembly gaps, then adjacent bins
  * merged until each holds ≥ minOverlap probes (cnv.py:138-211). The
  * merge loop is a driver-side loop of DataFrame transformations; each
  * pass is a window over (chromosome) — typically ≤ minOverlap passes.
  *
  * L8 — CBS segmentation per chromosome inside mapGroups (chromosomes
  * parallelize naturally), seeded permutation test
  * (cnv.py:191-193: shuffles=10000, p=1e-4 — we default to fewer
  * shuffles at equal determinism; tests use value tolerances like
  * tests/test_cnv.py:58-67).
  */
object Cnv {

  /** L5 — CNV log2 ratios. `targetIntensity`/`normIntensity`:
    * [probe_id, sample_label, total_ib] long tables (from
    * Prep.totalIbIntensity). Target samples are averaged (group CNV);
    * the regression runs target ~ [1, norm_1 … norm_k]. Returns
    * [probe_id, cnv]. */
  def copyNumberVariation(spark: SparkSession, targetIntensity: DataFrame,
      normIntensity: DataFrame, ranges: DataFrame): DataFrame = {
    val normSamples = normIntensity.select("sample_label").distinct()
      .collect().map(_.getString(0)).sorted
    val k = normSamples.length

    // one row per probe: target mean intensity + the k norm features,
    // only probes present (non-null) everywhere (cnv.py:101-123 dropna)
    val tgt = targetIntensity.groupBy("probe_id")
      .agg(avg("total_ib").as("y"),
        max(when(col("total_ib").isNull, 1).otherwise(0)).as("any_null"))
      .filter(col("any_null") === 0).drop("any_null")
    val features = normIntensity.groupBy("probe_id")
      .agg(map_from_entries(collect_list(
        struct(col("sample_label"), col("total_ib").cast("double"))))
        .as("fm"))
      .withColumn("xs", array(normSamples.map(s =>
        element_at(col("fm"), s)): _*))
      .filter(!exists(col("xs"), _.isNull))
      .select(col("probe_id"), col("xs"))
    val joined = tgt.join(features, "probe_id")
      .join(ranges.select("probe_id").distinct(), Seq("probe_id"))
      .cache()

    // Gram matrix G = Σ x̃ x̃ᵀ and moment vector b = Σ x̃ y, x̃ = [1, xs]
    val gramAggs =
      (for (i <- 0 to k; j <- i to k) yield {
        val xi = if (i == 0) lit(1.0) else element_at(col("xs"), i)
        val xj = if (j == 0) lit(1.0) else element_at(col("xs"), j)
        sum(xi * xj).as(s"g_${i}_$j")
      }) ++
        (for (i <- 0 to k) yield {
          val xi = if (i == 0) lit(1.0) else element_at(col("xs"), i)
          sum(xi * col("y")).as(s"b_$i")
        })
    val row = joined.agg(gramAggs.head, gramAggs.tail: _*).head()
    val g = DenseMatrix.zeros[Double](k + 1, k + 1)
    for (i <- 0 to k; j <- i to k) {
      val v = row.getDouble(row.fieldIndex(s"g_${i}_$j"))
      g(i, j) = v; g(j, i) = v
    }
    val b = DenseVector((0 to k).map(i =>
      row.getDouble(row.fieldIndex(s"b_$i"))).toArray)
    val beta = inv(g) * b // normal-equation solve, (k+1)×(k+1) on driver

    val predicted = beta.toArray.zipWithIndex.map { case (w, i) =>
      if (i == 0) lit(w) else lit(w) * element_at(col("xs"), i)
    }.reduce(_ + _)
    joined.select(col("probe_id"),
      log(2.0, col("y") / greatest(predicted, lit(1.0))).as("cnv"))
  }

  /** L6 step 1 — tiles − gaps: fixed tiles minus assembly gaps
    * (cnv.py:167-169). seqLengths: [chrom, seq_length];
    * gaps: [chrom, start, end]. */
  def gapAwareTiles(seqLengths: DataFrame, gaps: DataFrame,
      tileSize: Long = 50000L): DataFrame = {
    val tiles = Intervals.tileGenome(seqLengths, tileSize)
      .withColumn("tile_id",
        concat_ws(":", col("chrom"), col("start")))
    Intervals.subtractOverlaps(tiles, gaps, tileSize, Seq("tile_id"))
      .select(col("chrom"), col("frag_start").as("start"),
        col("frag_end").as("end"))
  }

  /** L6 step 2 — merge adjacent bins until every bin overlaps ≥
    * minOverlap probes (cnv.py:247-326). Each pass merges each
    * under-filled bin into its following neighbor (window over
    * chromosome); loops until stable or maxIter. */
  def mergeBinsToMinimumOverlap(spark: SparkSession, bins0: DataFrame,
      probes: DataFrame, minOverlap: Int = 20,
      maxIter: Int = 50): DataFrame = {
    var bins = bins0.select("chrom", "start", "end")
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val counts = Intervals.overlapJoin(
        bins.withColumn("bin_key", concat_ws(":", col("chrom"), col("start"))),
        probes, 50000L, Seq("bin_key"), Seq("probe_id"))
        .groupBy("chrom", "bin_key")
        .agg(count(lit(1)).as("n"))
      val withN = bins
        .withColumn("bin_key", concat_ws(":", col("chrom"), col("start")))
        .join(counts.select("bin_key", "n"), Seq("bin_key"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val under = withN.filter(col("n") < minOverlap).limit(1).count()
      if (under == 0) { done = true }
      else {
        // merge each under-filled bin with its successor: mark group
        // boundaries where the PREVIOUS bin was full
        val w = Window.partitionBy("chrom").orderBy("start")
        val wRun = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        bins = withN
          .withColumn("prev_full",
            coalesce(lag(col("n") >= minOverlap, 1).over(w), lit(true)))
          .withColumn("grp",
            sum(when(col("prev_full"), 1L).otherwise(0L)).over(wRun))
          .groupBy("chrom", "grp")
          .agg(min("start").as("start"), max("end").as("end"))
          .drop("grp")
          .localCheckpoint() // keep the loop's lineage flat
      }
      iter += 1
    }
    bins
  }

  /** L7 — per-bin median of the probe CNV signal (cnv.py:184-187).
    * cnv: [probe_id, cnv] joined with probe ranges; bins: [chrom,
    * start, end]. Output [chrom, start_bin, end_bin, cnv, map_loc]. */
  def binMedians(cnv: DataFrame, ranges: DataFrame,
      bins: DataFrame): DataFrame = {
    val probes = cnv.join(ranges, "probe_id")
      .filter(col("end") > col("start"))
      .select(col("probe_id"), col("chromosome").as("chrom"),
        col("start"), col("end"), col("cnv"))
    val binKeyed = bins.select(col("chrom"), col("start"), col("end"))
    Intervals.overlapJoin(probes, binKeyed.withColumn("bin_id",
      concat_ws(":", col("chrom"), col("start"))), 50000L,
      Seq("probe_id"), Seq("bin_id"))
      .groupBy(col("chrom"), col("r_start").as("start_bin"),
        col("r_end").as("end_bin"))
      .agg(percentile(col("cnv"), lit(0.5)).as("cnv"),
        count(lit(1)).as("n_probes"))
      .withColumn("map_loc",
        ((col("start_bin") + col("end_bin")) / 2).cast("long"))
  }

  /** L8 — circular binary segmentation per chromosome, executed inside
    * mapGroups (each chromosome's bins collected locally — thousands of
    * bins, KBs). Deterministic: RNG seeded per chromosome. Returns
    * [chromosome, seg_id, start, end, nb_bins, mean_cnv]. */
  def segment(spark: SparkSession, signalBins: DataFrame,
      shuffles: Int = 1000, pThreshold: Double = 1e-4): DataFrame = {
    import spark.implicits._
    val rows = signalBins
      .select(col("chrom"), col("map_loc").cast("long"),
        col("cnv").cast("double"))
      .as[(String, Long, Double)]
    rows.groupByKey(_._1)
      .flatMapGroups { (chrom, it) =>
        val sorted = it.toArray.sortBy(_._2)
        val values = sorted.map(_._3)
        val locs = sorted.map(_._2)
        val segs = cbs(values, shuffles, pThreshold,
          seed = chrom.hashCode.toLong)
        segs.iterator.zipWithIndex.map { case ((s, e), i) =>
          val slice = values.slice(s, e)
          (chrom, i, locs(s), locs(e - 1), e - s,
            slice.sum / slice.length)
        }
      }
      .toDF("chromosome", "seg_id", "start", "end", "nb_bins", "mean_cnv")
  }

  /** Recursive CIRCULAR binary segmentation (Olshen & Venkatraman 2004)
    * with a seeded permutation test — the reference's external
    * `linear_segment` CBS (cnv.py:191-193; its own tests accept value
    * tolerances for permutation noise, tests/test_cnv.py:58-67).
    *
    * At each segment the statistic is the max over ARCS [i, j) of the
    * two-sample t |mean_arc − mean_rest|·√(m·(n−m)/n) — an inserted
    * plateau (gain/loss with flanks on both sides) is found in ONE step,
    * where a single-split statistic needs two lucky cuts. A significant
    * arc splits the segment into up to three pieces, each recursed.
    *
    * Significance is an early-stopped permutation test (Fisher-Yates with
    * the per-chromosome seed). Arc scans are O(n²) via prefix sums; for
    * segments beyond `MaxScan` points both the observed and the permuted
    * scans evaluate arcs on a stride grid (same grid on both sides keeps
    * the p-value comparison like-for-like) — the bounded-cost analogue of
    * DNAcopy's sampled permutations. */
  def cbs(values: Array[Double], shuffles: Int, pThreshold: Double,
      seed: Long): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val rng = new scala.util.Random(seed)
    val MaxScan = 2048

    // best arc of v: (t, i, j) with arc [i, j), 0 <= i < j <= n,
    // excluding the full range; stride > 1 coarsens the candidate grid
    def maxT(v: Array[Double], stride: Int): (Double, Int, Int) = {
      val n = v.length
      if (n < 4) return (0.0, 0, 0)
      val s = new Array[Double](n + 1)
      var k = 0
      while (k < n) { s(k + 1) = s(k) + v(k); k += 1 }
      val total = s(n)
      var best = 0.0; var bi = 0; var bj = 0
      var i = 0
      while (i < n) {
        var j = i + stride
        while (j <= n) {
          val m = j - i
          if (m < n) {
            val arc = s(j) - s(i)
            val d = arc / m - (total - arc) / (n - m)
            val t = math.abs(d) * math.sqrt(m.toDouble * (n - m) / n)
            if (t > best) { best = t; bi = i; bj = j }
          }
          j += stride
        }
        i += stride
      }
      (best, bi, bj)
    }

    def strideOf(n: Int): Int = if (n <= MaxScan) 1 else n / MaxScan + 1

    def significant(v: Array[Double], tObs: Double): Boolean = {
      if (tObs == 0.0) return false
      val stride = strideOf(v.length)
      val maxHits = (pThreshold * shuffles).toInt
      var hits = 0
      var i = 0
      val copy = v.clone()
      while (i < shuffles && hits <= maxHits) {
        var j = copy.length - 1
        while (j > 0) { // Fisher-Yates with the seeded rng
          val k = rng.nextInt(j + 1)
          val tmp = copy(j); copy(j) = copy(k); copy(k) = tmp
          j -= 1
        }
        if (maxT(copy, stride)._1 >= tObs) hits += 1
        i += 1
      }
      hits > maxHits match {
        case true => false
        case false => hits.toDouble / shuffles <= pThreshold
      }
    }

    def recurse(lo: Int, hi: Int): Unit = {
      val v = values.slice(lo, hi)
      if (v.length < 4) { out += ((lo, hi)); return }
      val (t, i, j) = maxT(v, strideOf(v.length))
      val isProper = j > i && (i > 0 || j < v.length)
      if (isProper && significant(v, t)) {
        if (i > 0) recurse(lo, lo + i)
        recurse(lo + i, lo + j)
        if (j < v.length) recurse(lo + j, hi)
      } else out += ((lo, hi))
    }

    recurse(0, values.length)
    out.sortBy(_._1).toSeq
  }
}
