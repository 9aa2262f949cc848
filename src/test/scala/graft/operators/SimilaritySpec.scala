package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet").cache()

  test("brute-force top-k: self is rank 1 with cosine 1") {
    val q = emb.filter($"vec_id" === 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.bruteForceTopK(emb, q, k = 5)
      .orderBy("rank").collect()
    assert(top.head.getAs[Long]("vec_id") == 5L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
    assert(top.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // descending similarity
    val sims = top.map(_.getAs[Double]("cos"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("ivf with all clusters probed equals brute force") {
    val q = emb.filter($"vec_id".isin(0, 7))
      .select($"vec_id".as("query_id"), $"embedding")
    val nLabels = emb.select("label").distinct().count().toInt
    val bf = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"))
        -> r.getAs[Long]("vec_id")).toMap
    val ivf = Similarity.ivfTopK(emb, q, 10, "label", nProbe = nLabels)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"))
        -> r.getAs[Long]("vec_id")).toMap
    assert(bf == ivf)
  }

  test("ivf with pruning keeps reasonable recall") {
    val q = emb.filter($"vec_id".isin(1, 2, 3))
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, q, 10, "label", nProbe = 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    // synthetic labels are near-random clusters: expected recall for
    // nProbe of L labels is ≈ nProbe/L (here 3/L) — assert above chance/2
    val nLabels = emb.select("label").distinct().count().toDouble
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 1.5 / nLabels, s"recall $recall with $nLabels labels")
  }

  test("srp sketches: self is hamming 0 rank 1; sketches deterministic") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.srpHammingTopK(emb, q, k = 5).collect()
    val first = top.minBy(_.getAs[Long]("rank"))
    assert(first.getAs[Long]("vec_id") === 0L)
    assert(first.getAs[Long]("hamming") === 0L)
    val s1 = Similarity.srpSketches(emb).orderBy("vec_id").collect()
    val s2 = Similarity.srpSketches(emb).orderBy("vec_id").collect()
    assert(s1.map(_.getLong(1)).toSeq == s2.map(_.getLong(1)).toSeq)
    // sketches spread: not all identical
    assert(s1.map(_.getLong(1)).distinct.length > 10)
  }

  test("srpNearDupPairs equals brute-force pairs gated by shared bands") {
    val got = Similarity.srpNearDupPairs(emb, bands = 8, bandBits = 8,
        minCos = 0.2)
      .select($"id_a", $"id_b", round($"cos", 9).as("c"))
    // brute-force reference: all a<b pairs with cosine >= minCos AND at
    // least one equal 8-bit band between the two sketches
    val sk = Similarity.srpSketches(emb)
    val v = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .join(sk, "vec_id")
    val a = v.toDF("id_a", "v_a", "sk_a")
    val b = v.toDF("id_b", "v_b", "sk_b")
    val sharesBand = (0 until 8).map(j =>
        shiftrightunsigned($"sk_a", 8 * j).bitwiseAND(lit(255L)) ===
          shiftrightunsigned($"sk_b", 8 * j).bitwiseAND(lit(255L)))
      .reduce(_ || _)
    val want = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("cos", Similarity.cosine($"v_a", $"v_b"))
      .filter($"cos" >= 0.2 && sharesBand)
      .select($"id_a", $"id_b", round($"cos", 9).as("c"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() > 0)
  }

  test("k-means recovers the true partition from a noisy seeded init") {
    // three tight clusters at axis-aligned centers; every 5th point's
    // init label is wrong — two Lloyd iterations must fix them all
    val centers = Map(0L -> Array(10.0, 0.0, 0.0), 1L -> Array(0.0, 10.0, 0.0),
      2L -> Array(0.0, 0.0, 10.0))
    val pts = (0 until 90).map { i =>
      val truth = (i % 3).toLong
      val c = centers(truth)
      val jitter = Array(((i * 7) % 5) * 0.1, ((i * 11) % 5) * 0.1,
        ((i * 13) % 5) * 0.1)
      val noisyInit = if (i % 5 == 0) (truth + 1) % 3 else truth
      (i.toLong, noisyInit,
        Array.tabulate(3)(d => (c(d) + jitter(d)).toFloat))
    }.toDF("vec_id", "init", "embedding")
    val (assigned, cents) = Similarity.kMeans(pts, "init", iters = 2,
      outCol = "cluster")
    // every point lands with its true center's cluster
    val got = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusterOfTruth = (0L to 2L).map { t =>
      t -> got.collect { case (id, cl) if id % 3 == t => cl }.toSet
    }.toMap
    assert(clusterOfTruth.values.forall(_.size == 1),
      s"a true cluster was split: $clusterOfTruth")
    assert(clusterOfTruth.values.flatten.toSet.size == 3)
    // returned centroids are the means of the returned assignment
    val recomputed = Similarity.centroids(assigned, "cluster")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](r.fieldIndex("centroid")).toArray).toMap
    for ((cid, c) <- cents) {
      val rc = recomputed(cid)
      assert(c.zip(rc).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    }
    // and each centroid sits near its true center
    for ((_, c) <- cents)
      assert(centers.values.exists(t =>
        t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum < 1.0))
  }

  test("buildIvfIndex feeds ivfTopK: full-probe search equals brute force") {
    val indexed = Similarity.buildIvfIndex(emb, "label", iters = 2)
    val q = indexed.filter($"vec_id".isin(0, 7))
      .select($"vec_id".as("query_id"), $"embedding")
    val n = indexed.select("ivf_cluster").distinct().count().toInt
    val bf = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"))
        -> r.getAs[Long]("vec_id")).toMap
    val ivf = Similarity.ivfTopK(indexed, q, 10, "ivf_cluster", nProbe = n)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"))
        -> r.getAs[Long]("vec_id")).toMap
    assert(bf == ivf)
  }

  test("semDedup: planted duplicate sets keep exactly the smallest id") {
    // cluster 0: three copies of the same direction (+ one orthogonal),
    // cluster 1: two copies — keep = smallest id of each duplicate set
    val docs = Seq(
      (10L, Array(1f, 0f, 0f, 0f), 0),
      (11L, Array(2f, 0f, 0f, 0f), 0),  // dup of 10 (cos = 1)
      (12L, Array(1f, 1e-4f, 0f, 0f), 0), // near-dup of 10
      (13L, Array(0f, 0f, 1f, 0f), 0),  // orthogonal — kept
      (20L, Array(0f, 1f, 0f, 0f), 1),
      (21L, Array(0f, 3f, 0f, 0f), 1))  // dup of 20
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(docs, "label", iters = 1, minCos = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_sim_smaller"), r.getAs[Boolean]("keep"))).toMap
    assert(out(10L) == ((0L, true)))
    assert(out(11L)._2 == false && out(11L)._1 >= 1L)
    assert(out(12L)._2 == false)
    assert(out(13L) == ((0L, true)))
    assert(out(20L) == ((0L, true)))
    assert(out(21L) == ((1L, false)))
    // cross-cluster pairs are never compared: 10 and 20 both survive
    // even though the policy is global-greedy within clusters only
    assert(out.values.count(_._2) == 3)
  }

  test("semanticDecontaminate rejects an empty eval set instead of " +
      "silently passing the whole corpus") {
    // an empty eval side would make the crossJoin+groupBy return zero
    // rows — downstream reads that as "nothing contaminated" and the
    // audit vanishes; the guard must fail loudly at call time
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(
        emb, emb.filter($"vec_id" < 0), minCos = 0.9)
    }
    assert(ex.getMessage.contains("eval set is empty"))
  }

  test("annRecallEval: exhaustive probing scores exactly recall 1 and " +
      "rr 1; pruned probing is bounded by it and counts real overlap") {
    val q = emb.filter($"vec_id".isin(0, 7))
      .select($"vec_id".as("query_id"), $"embedding")
    val nLabels = emb.select("label").distinct().count().toInt
    val bf = Similarity.bruteForceTopK(emb, q, 10)
    val full = Similarity.ivfTopK(emb, q, 10, "label", nProbe = nLabels)
    val perfect = Similarity.annRecallEval(bf, full, 10).collect()
    assert(perfect.length == 2)
    perfect.foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 10L)
      assert(r.getAs[Double]("recall_at_k") == 1.0)
      assert(r.getAs[Double]("rr") == 1.0)
    }
    val pruned = Similarity.ivfTopK(emb, q, 10, "label", nProbe = 2)
    val ev = Similarity.annRecallEval(bf, pruned, 10).collect()
    ev.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(r.getAs[Double]("recall_at_k") == n / 10.0)
    }
  }

  test("annRecallEval divides by the per-query ground count when the " +
      "corpus is smaller than k") {
    val tiny = emb.filter($"vec_id" < 6) // 6 vectors, k = 10
    val q = tiny.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = Similarity.bruteForceTopK(tiny, q, 10)
    val ev = Similarity.annRecallEval(bf, bf, 10).collect()
    assert(ev.length == 1)
    assert(ev.head.getAs[Long]("n_overlap") == 6L)
    // dividing by lit(k) would report 0.6 for a perfect retrieval
    assert(ev.head.getAs[Double]("recall_at_k") == 1.0)
    assert(ev.head.getAs[Double]("rr") == 1.0)
  }

  /** Truncate-then-rerank: with coarseDims = the full dimension the
    * coarse stage IS brute force, so the pipeline must reproduce
    * bruteForceTopK row-for-row (the rerank is then an identity over
    * the same candidates); with a real truncation the recall against
    * exact search is measurable and, on this corpus, high — and both
    * stages' candidate flow is broadcast-only (no corpus shuffle). */
  test("twoStageTopK: full-width coarse equals brute force; truncated " +
      "recall measured against exact search") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = emb.filter($"vec_id".isin(0, 1, 2))
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
    val fullWidth = Similarity.twoStageTopK(emb, q, k = 10,
      coarseDims = 64, coarseK = 50)
    assert(fullWidth.except(exact).isEmpty &&
      exact.except(fullWidth).isEmpty)
    // coarseK >= corpus size: every row survives the prefilter, the
    // exact rerank sees the full corpus, so ANY coarseDims gives the
    // exact result — the sharp guarantee truncation cannot break
    val n = emb.count().toInt
    val allThrough = Similarity.twoStageTopK(emb, q, k = 10,
      coarseDims = 16, coarseK = n)
    assert(allThrough.except(exact).isEmpty &&
      exact.except(allThrough).isEmpty)
    // a real truncation on RANDOM vectors (no Matryoshka training to
    // concentrate signal in the prefix) still finds genuine overlap
    // with the exact top-10 — the measured-recall workflow itself is
    // what this pins, not a level the data can't promise
    val truncated = Similarity.twoStageTopK(emb, q, k = 10,
      coarseDims = 16, coarseK = 50)
    val ev = Similarity.annRecallEval(exact, truncated, k = 10)
      .collect()
    assert(ev.length == 3)
    ev.foreach(r => assert(r.getAs[Long]("n_overlap") >= 1L,
      r.toString))
    intercept[IllegalArgumentException] {
      Similarity.twoStageTopK(emb, q, k = 10, coarseK = 5)
    }
  }

  test("centroids are per-dimension means") {
    val two = Seq(
      (1L, Array(1f, 3f), 0), (2L, Array(3f, 5f), 0), (3L, Array(10f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.centroids(two, "label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(cents(0) == Seq(2.0, 4.0))
    assert(cents(1) == Seq(10.0, 0.0))
  }
}
