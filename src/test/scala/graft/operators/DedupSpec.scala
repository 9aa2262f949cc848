package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with two exact dups, one near-dup pair, one unrelated doc
  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank now"),
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "another unrelated document mentioning columnar storage formats only"))
    .toDF("doc_id", "text")

  test("exact dedup groups by full-text hash") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_copies") == 2)
    assert(groups.head.getAs[Long]("keep_id") == 1)
  }

  test("jaccard pairs finds the near-dup with the exact similarity") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.7)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("prefix-filtered jaccard equals the inverted-index exact variant") {
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    for (t <- Seq(0.12, 0.3, 0.6)) {
      val a = Dedup.jaccardPairs(real, "doc_id", "text", k = 3,
          threshold = t)
        .select($"id_a", $"id_b", $"n_common", round($"jaccard", 9))
      val b = Dedup.jaccardPairsPrefix(real, "doc_id", "text", k = 3,
          threshold = t)
        .select($"id_a", $"id_b", $"n_common", round($"jaccard", 9))
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        s"prefix-filtered output differs at threshold $t")
    }
    // and on the synthetic fixture with exact dups
    val p = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", k = 3,
        threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(p.contains((1L, 2L)) && p((1L, 2L)) == 1.0)
  }

  test("minhash-LSH candidates cover high-jaccard pairs; estimates track") {
    val cands = Dedup.minHashCandidates(docs, "doc_id", "text", k = 3,
      numHashes = 32, bands = 16)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(cands.contains((1L, 2L)))
    assert(math.abs(cands((1L, 2L)) - 1.0) < 1e-9) // identical docs
    assert(cands.contains((1L, 3L)))
    assert(cands((1L, 3L)) > 0.5)
  }

  test("simhash: identical docs distance 0; near-dups within 3 bits") {
    val cands = Dedup.simHashCandidates(docs, "doc_id", "text", maxDist = 3)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(cands.get((1L, 2L)).contains(0))
  }

  test("deterministic signatures across runs") {
    val s1 = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val s2 = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(s1 == s2)
  }
}
