package graft

/** Partition-count invariance — the property that makes the sf0.01
  * oracle gate meaningful at 100 TB: a registry query must produce
  * IDENTICAL rows whether a stage runs in 3 tasks or 32 (or 10,000 on a
  * cluster). Aggregation-order drift, partition-dependent ids
  * (monotonically_increasing_id in Ranks), per-partition heaps (TopKAgg),
  * partition-offset plans and sort-merge ECDF counts are all exercised
  * by re-running representative queries under a deliberately tiny
  * shuffle-partition count and diffing against the default-config rows.
  */
class PartitionInvarianceSpec extends SparkSpec {

  // the partition-sensitive machinery: hash agg (q01), distributed BH
  // rank (q19), exact percentiles (q20), corr/stddev (q21), MinHash LSH
  // postings (q33), centroid means (q37), ntile offsets (q40),
  // SRP-band near-dup (q44), rollup Expand (q45), sort-merge ECDF (q48)
  // (r5 additions: q59 sort-merge ECDF + bg-sum window + weak prior;
  // q60 row-local gram kernel through an orderBy; q61 broadcast
  // decontamination counts)
  private val names = Set("q01_pricing_summary", "q19_bh_adjust",
    "q20_quantiles_iqr", "q21_corr_stddev", "q33_minhash_lsh",
    "q37_embedding_centroids", "q40_ntile_deciles",
    "q44_embedding_neardup", "q45_rollup", "q48_ecdf_lookup",
    "q59_poobah_slice", "q60_repetition", "q61_decontaminate")

  test("query results are identical at 3 and 8 shuffle partitions") {
    val dir = sf("sf0.001")
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      for (q <- SparkEntry.registry if names(q.name)) {
        spark.conf.set(key, "8")
        val base = q.run(spark, dir).collect().toSeq
        spark.conf.set(key, "3")
        val tiny = q.run(spark, dir).collect().toSeq
        assert(base == tiny,
          s"${q.name} rows differ between 8 and 3 shuffle partitions")
        assert(base.nonEmpty, s"${q.name} returned no rows at sf0.001")
      }
    } finally spark.conf.set(key, before)
  }
}
