package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key skew evidence for the dedup family — the crawl-corpus
  * failure mode: boilerplate (shared headers/footers) concentrates a
  * large fraction of the corpus onto a handful of shingle/line keys,
  * and any pair expansion quadratic in document frequency explodes.
  *
  * Two synthetic 500k-doc corpora, identical except for boilerplate:
  *   - uniform: every document is two unique hash-derived lines
  *   - skewed: 30% of documents share ONE boilerplate first line
  *     (150k-document hot keys for every shingle of that line)
  *
  * Timed stages:
  *   1. exact dedup (fingerprint groupBy — the skew-immune baseline:
  *      a hot fingerprint is just a bigger count cell)
  *   2. n-gram Jaccard via jaccardDedup's autocap route — the derived
  *      document-frequency cap must drop the boilerplate shingles
  *      instead of expanding (150k choose 2) candidate pairs
  *   3. cross-corpus line dedup (dedupLines) — the hot line's document
  *      frequency is collapsed map-side; work stays O(lines)
  *
  * Healthy = skew/uniform wall-time ratio ≈ 1 for every stage. A
  * quadratic expansion would show minutes-vs-seconds, not a ratio.
  *
  *   sbt "runMain graft.DedupSkewBench"   (SPARK_GRAFT_CPUS overrides)
  */
object DedupSkewBench {

  private val NDocs = 500000L

  private def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def words(seed: Int, n: Int) = concat_ws(" ",
    (0 until n).map(j =>
      concat(lit("w"), pmod(xxhash64(col("_pk"), lit(seed), lit(j)),
        lit(40000L)))): _*)

  private def corpus(spark: SparkSession, skewed: Boolean): DataFrame = {
    val hot = "the quick brown fox jumps over the lazy dog boilerplate"
    val line1 =
      if (skewed)
        when(col("doc_id") % 10 < 3, lit(hot)).otherwise(words(1, 6))
      else words(1, 6)
    spark.range(NDocs).select(col("id").as("doc_id"))
      // planted duplicate pairs: ids with doc_id % 100 in {98, 99}
      // share their _pk with the even partner -> exact dups AND
      // Jaccard-1 near-dup pairs, disjoint from the hot-line region
      .withColumn("_pk",
        when(col("doc_id") % 100 >= 98,
          (col("doc_id") .divide(2)).cast("long") * 2)
          .otherwise(col("doc_id")))
      .select(col("doc_id"),
        concat_ws("\n", line1, words(2, 6)).as("text"))
  }

  private def runStages(spark: SparkSession, skewed: Boolean)
      : (Double, Double, Double, Long, Long, Long) = {
    val docs = corpus(spark, skewed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    try {
      val (nExact, tExact) = timeIt {
        docs.groupBy(graft.functions.Expressions.polyHash64(col("text"))
            .as("fp"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
      }
      val (nPairs, tJac) = timeIt {
        val pairs = operators.Dedup.jaccardDedup(docs, "doc_id", "text",
          k = 3, threshold = 0.4)
        val n = pairs.count()
        pairs.unpersist()
        n
      }
      val (nLines, tLines) = timeIt {
        operators.Dedup.dedupLines(docs, "doc_id", "text")
          .filter(col("n_dropped") > 0).count()
      }
      (tExact, tJac, tLines, nExact, nPairs, nLines)
    } finally { docs.unpersist(); () }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Q.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up pass (codegen + JIT for every stage shape), then timed
    runStages(spark, skewed = false)
    val (ue, uj, ul, uEx, uPr, uLn) = runStages(spark, skewed = false)
    val (se, sj, sl, sEx, sPr, sLn) = runStages(spark, skewed = true)
    def r(a: Double, b: Double) = math.round(a / b * 100.0) / 100.0
    println(s"""{"metric":"dedup_skew","unit":"sec","docs":$NDocs,""" +
      s""""hot_share":0.3,""" +
      s""""uniform":{"exact":$ue,"jaccard":$uj,"line_dedup":$ul,""" +
      s""""dup_groups":$uEx,"pairs":$uPr,"docs_with_dropped":$uLn},""" +
      s""""skew":{"exact":$se,"jaccard":$sj,"line_dedup":$sl,""" +
      s""""dup_groups":$sEx,"pairs":$sPr,"docs_with_dropped":$sLn},""" +
      s""""ratio":{"exact":${r(se, ue)},"jaccard":${r(sj, uj)},""" +
      s""""line_dedup":${r(sl, ul)}}}""")
    spark.stop()
  }
}
