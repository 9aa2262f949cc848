package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, stable under corpus growth, ~weighted") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Curation.hashSplit(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.hashSplit(big, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growing the corpus never moves an existing row's split
    assert(a.forall { case (id, s) => b(id) == s })
    // every row is assigned (weights sum to 1)
    assert(b.values.forall(Set("train", "val", "test")))
    // proportions track the weights (±4% at n=5000)
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 5000.0)
    assert(math.abs(frac("train") - 0.8) < 0.04, frac.toMap.toString)
    assert(math.abs(frac("val") - 0.1) < 0.04)
    assert(math.abs(frac("test") - 0.1) < 0.04)
    // invalid weights rejected
    assertThrows[IllegalArgumentException](
      Curation.hashSplit(small, "id", Seq(("a", 0.9), ("b", 0.2))))
  }

  test("sampleByGroup: per-group rates, deterministic keep set") {
    val df = spark.range(4000)
      .select($"id", (when($"id" % 2 === 0, "a").otherwise("b")).as("g"))
    val kept = Curation.sampleByGroup(df, "id", "g",
      Map("a" -> 0.25, "b" -> 1.0))
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("b") == 2000L) // rate 1.0 keeps everything
    assert(math.abs(byG("a") - 500L) < 80, byG.toString) // ~25% of 2000
    // re-running yields the identical keep set
    val again = Curation.sampleByGroup(df, "id", "g",
      Map("a" -> 0.25, "b" -> 1.0))
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }

  test("temperatureSample: kept mixture tracks w^alpha, smallest " +
      "source keeps all") {
    // sources with 4:1 natural imbalance
    val df = spark.range(5000)
      .select($"id", when($"id" % 5 === 0, "small").otherwise("big")
        .as("src"))
    val out = Curation.temperatureSample(df, "id", "src", alpha = 0.5)
    val byS = out.filter($"keep").groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small (n=1000) keeps 100%
    assert(byS("small") == 1000L)
    // big (n=4000) keeps ~sqrt(1000/4000) = 50% → kept ratio big:small
    // ≈ sqrt(4):1 = 2:1 (the α=0.5 target), ±5%
    val ratio = byS("big").toDouble / byS("small")
    assert(math.abs(ratio - 2.0) < 0.1, byS.toString)
    // determinism: identical keep set on a rerun
    val again = Curation.temperatureSample(df, "id", "src", alpha = 0.5)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // alpha = 1 keeps everything (natural mixture)
    val nat = Curation.temperatureSample(df, "id", "src", alpha = 1.0)
    assert(nat.filter(!$"keep").count() == 0L)
  }

  test("weightedSample: reproducible, matches the window reference, " +
      "heavier rows sampled more") {
    val df = spark.range(10000)
      .select($"id", when($"id" % 10 === 0, 100.0).otherwise(1.0)
        .as("w"))
    val got = Curation.weightedSample(df, "id", $"w", k = 500)
    // reproducible
    val again = Curation.weightedSample(df, "id", $"w", k = 500)
    assert(got.except(again).isEmpty && again.except(got).isEmpty)
    // equals the brute-force window formulation
    val u = (Curation.splitmix($"id").bitwiseAND(lit((1L << 53) - 1))
      .cast("double") + 0.5) / math.pow(2.0, 53)
    val ref = df.withColumn("key", log(u) / $"w")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"key".desc, $"id")).cast("long"))
      .filter($"rank" <= 500)
      .select($"id", $"key".as("es_key"), $"rank")
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    // heavy rows (10% of corpus, weight 100) dominate the sample:
    // expected share 100/(100+9) ≈ 92%
    val heavy = got.filter($"id" % 10 === 0).count()
    assert(heavy > 400, s"heavy=$heavy of 500")
  }

  test("chunkSpans: overlap coverage invariants") {
    val df = Seq((1L, 100L), (2L, 64L), (3L, 65L), (4L, 0L), (5L, 1L))
      .toDF("doc_id", "n")
    val out = Curation.chunkSpans(df, "doc_id", $"n",
      window = 64, stride = 48).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok")))
      .sortBy(t => (t._1, t._2))
    // doc 1 (100 toks): chunks [0,64) and [48,100)
    assert(out.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 64L), (48L, 100L)))
    // doc 2 (exactly one window): single chunk
    assert(out.filter(_._1 == 2L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 64L)))
    // doc 3 (65): second chunk starts at stride, truncated
    assert(out.filter(_._1 == 3L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 64L), (48L, 65L)))
    // empty doc: no chunks; 1-token doc: one degenerate chunk
    assert(!out.exists(_._1 == 4L))
    assert(out.filter(_._1 == 5L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 1L)))
    // every token position of every doc is covered by >= 1 chunk
    for ((id, n) <- Seq((1L, 100L), (2L, 64L), (3L, 65L), (5L, 1L))) {
      val spans = out.filter(_._1 == id).map(t => (t._3, t._4))
      assert((0L until n).forall(p =>
        spans.exists { case (s, e) => s <= p && p < e }), s"doc $id")
    }
    assertThrows[IllegalArgumentException](
      Curation.chunkSpans(df, "doc_id", $"n", window = 4, stride = 5))
  }

  test("capPerGroup equals the row_number window reference") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val pr = Curation.splitmix($"doc_id")
    val got = Curation.capPerGroup(docs, "source", "doc_id", 5, pr)
      .select($"source", $"doc_id", $"rank")
    val ref = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy($"source").orderBy(pr, $"doc_id"))
        .cast("long"))
      .filter($"rank" <= 5)
      .select($"source", $"doc_id", $"rank")
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    // quota respected
    val m = got.groupBy("source").count().collect().map(_.getLong(1))
    assert(m.forall(_ <= 5))
  }

  test("tfIdf matches a hand computation on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a c"),   // tf(a)=2 tf(b)=1 tf(c)=1
      (2L, "a b"),       // tf(a)=1 tf(b)=1
      (3L, "d d d")      // tf(d)=3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("doc_freq"),
          r.getAs[Double]("tfidf"))).toMap
    def idf(df: Long): Double = math.log(4.0 / (df + 1)) + 1 // N=3
    assert(out((1L, "a")) == ((2L, 2L, 2 * idf(2))))
    assert(out((2L, "a")) == ((1L, 2L, 1 * idf(2))))
    assert(out((3L, "d")) == ((3L, 1L, 3 * idf(1))))
    assert(out((1L, "c"))._3 == idf(1))
  }

  test("bm25: docs with more query-term mass score higher; non-matching " +
      "docs are absent") {
    val docs = Seq(
      (1L, "hash hash hash join scan"),
      (2L, "hash join"),
      (3L, "sort spill window"),
      (4L, "scan")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25(docs, "doc_id", "text",
      Seq("hash", "scan"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(!scores.contains(3L)) // no query term
    assert(scores(1L) > scores(2L)) // more hits, extra term
    assert(scores.values.forall(_ > 0))
  }

  test("repetition stats: hand-computed bigram fractions; short docs " +
      "degrade to zeros") {
    val docs = Seq(
      // "a b a b a": bigrams [a b, b a, a b, b a] → top 2/4, dup 4/4
      (1L, "a b a b a"),
      // all-distinct bigrams: top 1/3, dup 0
      (2L, "w x y z"),
      // one word → no bigrams
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("top_gram_frac"),
          r.getAs[Double]("dup_gram_frac"),
          r.getAs[Long]("n_grams")))).toMap
    assert(out(1L) == ((0.5, 1.0, 4L)))
    assert(out(2L) == ((1.0 / 3, 0.0, 3L)))
    assert(out(3L) == ((0.0, 0.0, 0L)))
    assert(out(4L) == ((0.0, 0.0, 0L)))
    // trigram variant on the repeated doc: [a b a, b a b, a b a] →
    // top 2/3, dup 2/3
    val tri = TextAnalysis.repetitionStats(docs.filter($"doc_id" === 1),
        n = 3).collect().head
    assert(tri.getAs[Double]("top_gram_frac") == 2.0 / 3)
    assert(tri.getAs[Double]("dup_gram_frac") == 2.0 / 3)
  }

  test("packSequences: offsets are the exclusive token prefix sum") {
    val docs = Seq(
      (1L, "a b c"),            // 3 tokens, offset 0, chunks [0,0]
      (2L, "d e f g h"),        // 5 tokens, offset 3, spans the cut
      (3L, ""),                 // split("") is [""] -> 1 token
      (4L, "i j"))              // offset 9
      .toDF("doc_id", "text")
    val out = Curation.packSequences(docs, "doc_id",
        size(split($"text", " ")), 4)
      .select("doc_id", "n_tokens", "token_offset", "chunk_start",
        "chunk_end")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L)))
    assert(out(2L) == ((5L, 3L, 0L, 1L))) // crosses the 4-token cut
    assert(out(3L) == ((1L, 8L, 2L, 2L)))
    assert(out(4L) == ((2L, 9L, 2L, 2L)))
  }

  test("redactPii: counts on original text, fixed-order redaction") {
    val docs = Seq(
      (1L, "mail a.b@x.org and c@d.io now"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
      (3L, "v1.2.3.4 is a version, not 1.2.3.4 only"),
      (4L, "clean"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_ssns"),
          r.getAs[Int]("n_phones"), r.getAs[Int]("n_ips"),
          r.getAs[String]("redacted")))).toMap
    assert(out(1L) == ((2, 0, 0, 0, "mail <EMAIL> and <EMAIL> now")))
    assert(out(2L) ==
      ((0, 1, 1, 1, "ssn <SSN> phone <PHONE> ip <IP>")))
    // \b is a WORD boundary: 'v' and '1' are both word chars, so the
    // quad inside "v1.2.3.4" does NOT match — only the standalone one
    assert(out(3L)._4 == 1)
    assert(out(4L) == ((0, 0, 0, 0, "clean")))
  }

  test("dsirLogRatios separates target-like documents from the pool " +
      "and a pure-target doc outranks a pure-pool doc") {
    val rnd = new scala.util.Random(3)
    // two disjoint vocabularies: 'target' docs vs 'other' docs. Small
    // vocab (10 words → ≤100 bigram types) so the 30 training docs
    // cover the holdout's bigrams — DSIR scores hashed-bigram overlap,
    // and an uncovered bigram contributes a NEGATIVE smoothed ratio
    def doc(prefix: String, n: Int) =
      (1 to n).map(_ => s"$prefix${rnd.nextInt(10)}").mkString(" ")
    val docs = ((1 to 30).map(i => (i.toLong, true, doc("t", 40))) ++
      (31 to 60).map(i => (i.toLong, false, doc("o", 40))) ++
      // held-out docs: one from each vocabulary, NOT in the target slice
      Seq((61L, false, doc("t", 40)), (62L, false, doc("o", 40))))
      .toDF("doc_id", "is_t", "text")
    val lr = Curation.dsirLogRatios(docs, "doc_id", "is_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(lr(61L) > lr(62L),
      s"target-vocab holdout ${lr(61L)} must outrank pool-vocab ${lr(62L)}")
    assert(lr(61L) > 0.0 && lr(62L) < 0.0)
  }

  test("rankBuckets equals the window-rank reference and is partition " +
      "invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 97).map(i =>
      (i.toLong, s"g${i % 4}", rnd.nextInt(20).toDouble))
    val df = rows.toDF("id", "g", "s").repartition(7)
    val out = Curation.rankBuckets(df, "g",
      Seq(col("s"), col("id")), nBuckets = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("bucket"))).toMap
    val ref = df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy("s", "id"))
          .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("bucket", expr("(rank * 3 + n - 1) div n"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("bucket"))).toMap
    assert(out == ref)
    assert(out.values.map(_._2).toSet == Set(1L, 2L, 3L))
    val again = Curation.rankBuckets(df.repartition(2), "g",
      Seq(col("s"), col("id")), nBuckets = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("bucket"))).toMap
    assert(again == out)
  }

  test("mixWithEpochs: exact integer plan arithmetic, deterministic " +
      "remainder sample, zero-weight sources zero out") {
    val docs = ((1 to 30).map(i => (i.toLong, "a", 10L)) ++ // A = 300
      (31 to 40).map(i => (i.toLong, "b", 5L)) ++           // B = 50
      (41 to 45).map(i => (i.toLong, "c", 7L)))             // unweighted
      .toDF("doc_id", "source", "tk")
    val out = Curation.mixWithEpochs(docs, "doc_id", "source",
      col("tk"), Seq("a" -> 6000L, "b" -> 4000L), budgetTokens = 950L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // target = 950*6000 div 10000 = 570; epochs = 570 div 300 = 1;
    // remainder 270 → rem_bp = 270*10000 div 300 = 9000
    assert(a.getAs[Long]("target_tokens") == 570L)
    assert(a.getAs[Long]("full_epochs") == 1L)
    assert(a.getAs[Long]("rem_bp") == 9000L)
    assert(a.getAs[Long]("effective_tokens") ==
      300L + a.getAs[Long]("rem_tokens"))
    assert(a.getAs[Long]("rem_tokens") == 10L * a.getAs[Long]("rem_docs"))
    val b = out("b")
    // target = 380; epochs = 7; remainder 30 → rem_bp = 6000
    assert(b.getAs[Long]("target_tokens") == 380L)
    assert(b.getAs[Long]("full_epochs") == 7L)
    assert(b.getAs[Long]("rem_bp") == 6000L)
    val c = out("c")
    assert(c.getAs[Long]("target_tokens") == 0L)
    assert(c.getAs[Long]("full_epochs") == 0L)
    assert(c.getAs[Long]("rem_docs") == 0L)
    assert(c.getAs[Long]("effective_tokens") == 0L)
    // deterministic: a second run realizes the identical sample
    val again = Curation.mixWithEpochs(docs, "doc_id", "source",
      col("tk"), Seq("a" -> 6000L, "b" -> 4000L), budgetTokens = 950L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rem_tokens"))
      .toMap
    assert(again("a") == a.getAs[Long]("rem_tokens"))
    assert(again("b") == b.getAs[Long]("rem_tokens"))
  }

  test("mixWithEpochs: duplicate weight keys rejected; a weighted " +
      "source absent from the corpus emits a visible shortfall row") {
    val docs = (1 to 10).map(i => (i.toLong, "a", 10L))
      .toDF("doc_id", "source", "tk")
    intercept[IllegalArgumentException] {
      Curation.mixWithEpochs(docs, "doc_id", "source", col("tk"),
        Seq("a" -> 1000L, "a" -> 1000L), budgetTokens = 100L)
    }
    // "ghost" is weighted but has zero corpus rows (typo'd source
    // name): the plan must SHOW the shortfall, not silently drop it
    val out = Curation.mixWithEpochs(docs, "doc_id", "source",
      col("tk"), Seq("a" -> 5000L, "ghost" -> 5000L),
      budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("ghost")
    assert(g.getAs[Long]("available_docs") == 0L)
    assert(g.getAs[Long]("available_tokens") == 0L)
    assert(g.getAs[Long]("target_tokens") == 500L)
    assert(g.getAs[Long]("full_epochs") == 0L)
    assert(g.getAs[Long]("rem_bp") == 0L)
    assert(g.getAs[Long]("effective_tokens") == 0L)
    // the present source is planned exactly as before
    assert(out("a").getAs[Long]("target_tokens") == 500L)
    assert(out("a").getAs[Long]("full_epochs") == 5L)
    assert(out("a").getAs[Long]("effective_tokens") == 500L)
  }

  test("leakageSafeSplit: near-dup clusters never straddle splits, " +
      "singletons keep their plain hash split") {
    // 40 near-dup pairs (2i, 2i+1) + 20 singletons. With per-doc hash
    // splitting many pairs straddle; component splitting must yield 0.
    val base = (0 until 40).map { i =>
      val t = s"shared sentence number $i repeated across the pair " +
        s"plus filler filler filler $i"
      Seq((2L * i, t), (2L * i + 1, t + " tail"))
    }.flatten
    val singles = (100 until 120).map(i =>
      (i.toLong, s"unique doc $i with words ${i * 7} ${i * 13} ${i * 31}"))
    val docs = (base ++ singles).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.3)
    assert(pairs.count() >= 30) // the twins really are near-dups
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.leakageSafeSplit(docs, pairs, "doc_id", splits)
    val byDoc = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[String]("split"))).toMap
    // no pair straddles
    pairs.select("id_a", "id_b").collect().foreach { r =>
      assert(byDoc(r.getLong(0))._2 == byDoc(r.getLong(1))._2)
    }
    // every member carries its component's bucket, and the naive
    // per-doc split DOES straddle somewhere (the leak this op fixes)
    val naive = Curation.hashSplit(docs, "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    val straddling = pairs.select("id_a", "id_b").collect()
      .count(r => naive(r.getLong(0)) != naive(r.getLong(1)))
    assert(straddling > 0, "fixture too small to show the leak")
    // singletons (no pairs) degrade to exactly the plain hash split
    (100 until 120).foreach { i =>
      assert(byDoc(i.toLong)._1 == i.toLong)
      assert(byDoc(i.toLong)._2 == naive(i.toLong))
    }
  }

  /** The structural guarantee of length bucketing: every batch lives
    * inside one `bucketWidth`-wide length bucket, so per-row padding is
    * < bucketWidth and total_padding < n_rows·bucketWidth — regardless
    * of the length distribution. Batch sizes respect the cap, ids are
    * unique across buckets, every row is assigned exactly once. */
  test("lengthBucketedBatches: padding bound, batch-size cap, " +
      "lossless assignment") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, 1 + rnd.nextInt(300)))
    val df = rows.toDF("doc_id", "n_tok")
    val b = Curation.lengthBucketedBatches(df, "doc_id", col("n_tok"),
      batchSize = 8, bucketWidth = 16)
    val got = b.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    assert(got.length == 500 && got.map(_._1).distinct.length == 500)
    // every batch inside one bucket, size <= 8
    val byBatch = got.groupBy(_._4)
    byBatch.values.foreach { g =>
      assert(g.length <= 8)
      assert(g.map(_._3).distinct.length == 1, "batch straddles buckets")
      assert(g.map(_._2).max - g.map(_._2).min < 16)
    }
    // census identities + the padding theorem
    val cen = Curation.paddingCensus(b).collect().head
    assert(cen.getAs[Long]("n_rows") == 500L)
    assert(cen.getAs[Long]("total_tokens") == rows.map(_._2.toLong).sum)
    assert(cen.getAs[Long]("total_padding") < 500L * 16)
    // and the padding matches the brute-force recomputation
    val brute = byBatch.values.map { g =>
      g.map(_._2).max * g.length - g.map(_._2).sum }.sum
    assert(cen.getAs[Long]("total_padding") == brute)
  }

  test("temporalEmbargoSplit: train strictly precedes the embargo " +
      "gap which strictly precedes test; boundary is integer-exact") {
    val rows = (0L until 100L).map(i =>
      (i, new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("id", "ts")
    val out = Curation.temporalEmbargoSplit(rows, $"ts",
        trainPct = 80, embargoUs = 5L * 60000000L) // 5-minute gap
      .select($"id", $"split",
        unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val by = out.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    // lo + (hi-lo)*80 div 100 over ids 0..99 spaced 1 min = id 79.2
    // → train ids 0..79, embargo = 5 minutes after the boundary
    assert(by("train").max < by("embargo").min)
    assert(by("embargo").max < by("test").min)
    // boundary = 4752 s after lo; embargo ends at 5052 s → ids 80..84
    assert(out.count(_._2 == "train") == 80)
    assert(out.count(_._2 == "embargo") == 5)
    assert(out.count(_._2 == "test") == 15)
    // deterministic: identical assignment on a reshuffled frame
    val again = Curation.temporalEmbargoSplit(
        rows.repartition(7), $"ts", 80, 5L * 60000000L)
      .select($"id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (id, s, _) => again(id) == s })
  }

  test("temporalEmbargoSplit: NULL timestamps land in 'unknown', " +
      "never in 'test', and do not move the boundary") {
    val dense = (0L until 100L).map(i =>
      (i, Some(new java.sql.Timestamp(1700000000000L + i * 60000L))))
    val nulls = (100L until 110L).map(i =>
      (i, Option.empty[java.sql.Timestamp]))
    val out = Curation.temporalEmbargoSplit(
        (dense ++ nulls).toDF("id", "ts"), $"ts",
        trainPct = 80, embargoUs = 5L * 60000000L)
      .select($"id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every planted null row is labeled 'unknown' — a bare otherwise
    // branch would silently default them into 'test', which is exactly
    // the leakage this operator exists to prevent
    (100L until 110L).foreach(i => assert(out(i) == "unknown",
      s"null-ts row $i labeled ${out(i)}"))
    assert(!out.exists { case (id, s) => id >= 100L && s == "test" })
    // non-null rows split exactly as they do without the null rows:
    // nulls are ignored by the min/max span, so the boundary is fixed
    val ref = Curation.temporalEmbargoSplit(
        dense.toDF("id", "ts"), $"ts", 80, 5L * 60000000L)
      .select($"id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 100L).foreach(i => assert(out(i) == ref(i)))
    // and the partition is complete: every row got a label
    assert(out.size == 110 &&
      out.values.forall(Set("train", "embargo", "test", "unknown")))
  }

  test("equivalenceClasses: sizes per QI combination, distinct " +
      "sensitive values when requested") {
    val rows = Seq(
      ("en", "web", "s1"), ("en", "web", "s1"), ("en", "web", "s2"),
      ("en", "book", "s1"),
      ("fr", "web", "s3")).toDF("lang", "src", "sens")
    val plain = Curation.equivalenceClasses(rows, Seq($"lang", $"src"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("sz")).toMap
    assert(plain == Map(("en", "web") -> 3L, ("en", "book") -> 1L,
      ("fr", "web") -> 1L))
    val withL = Curation.equivalenceClasses(rows, Seq($"lang", $"src"),
        sensitive = Some($"sens"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("sz"), r.getAs[Long]("l_div")))).toMap
    assert(withL(("en", "web")) == ((3L, 2L)))
    assert(withL(("en", "book")) == ((1L, 1L)))
  }
}
