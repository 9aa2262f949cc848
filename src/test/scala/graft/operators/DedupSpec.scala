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

  test("prefix variant keeps the exact-boundary pair (J exactly at the " +
      "threshold) that FP-multiply pruning dropped") {
    // nested pair: A = 9 words (7 trigrams), B = A + 3 words (10
    // trigrams, superset) → J = 7/(7+10−7) = 0.7 EXACTLY at the 0.7
    // threshold. Both FP hazards fire here when computed as multiplies:
    // fl(0.7·10) = 7.000000000000001 shortens B's prefix below the
    // theorem bound (pair never becomes a candidate) and fails the
    // length prune (7 ≥ 7.0000…01 is false) — either alone silently
    // drops a pair the exact predicate emits.
    val aWords = (1 to 9).map(i => s"w$i")
    val corpus = Seq(
      (1L, aWords.mkString(" ")),
      (2L, (aWords ++ Seq("x1", "x2", "x3")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", k = 3,
      threshold = 0.7).collect()
    assert(got.length == 1, s"boundary pair missing: ${got.mkString}")
    assert(got.head.getAs[Long]("id_a") == 1L &&
      got.head.getAs[Long]("id_b") == 2L)
    assert(got.head.getAs[Long]("n_common") == 7L)
    assert(got.head.getAs[Double]("jaccard") == 0.7)
    // and the exact inverted-index variant agrees it belongs in the set
    assert(Dedup.jaccardPairs(corpus, "doc_id", "text", k = 3,
      threshold = 0.7).count() == 1L)
  }

  test("PPJoin length filter prunes length-skewed candidates the prefix " +
      "filter passes, without changing the output") {
    // one 60-word doc L built from 20 distinct (aj bj cj) triples, a
    // near-identical copy L2 (last word changed → J = 57/59), and 20
    // five-word shorts each sharing exactly its own triple with L. At
    // t = 0.12 a short's prefix is ALL 3 of its trigrams (3−⌈0.36⌉+1)
    // and L's 52-slot prefix reaches well into the shared triples, so
    // the prefix index emits many (short, L/L2) candidates — but
    // min/max = 3/58 < 0.12 ≤ threshold means none can verify: exactly
    // the pairs the length filter must kill BEFORE their 58-element
    // shingle arrays ship into the verify exchange.
    val l = (1 to 20).flatMap(j => Seq(s"a$j", s"b$j", s"c$j"))
    val shorts = (1 to 20).map { j =>
      (10L + j, s"a$j b$j c$j s${j}p s${j}q")
    }
    val corpus = (Seq(
      (1L, l.mkString(" ")),
      (2L, (l.init :+ "z").mkString(" "))) ++ shorts)
      .toDF("doc_id", "text")
    val shingled = Dedup.withShingleHashes(corpus, "text", 3)
      .select($"doc_id".as("id"), $"sh_hs")
      .filter(size($"sh_hs") > 0)
    val nCands = Dedup.prefixCandidates(shingled, 0.12).count()
    val filtered = Dedup.prefixLengthFiltered(shingled, 0.12)
    val nKept = filtered.count()
    assert(nCands - nKept >= 10,
      s"length filter pruned only ${nCands - nKept} of $nCands " +
        "candidates on a corpus planted to defeat the prefix filter")
    // the survivor is the genuine near-pair, sizes attached
    val kept = filtered.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(kept.contains((1L, 2L)))
    // equality with the exact variant: pruning removed only dead pairs
    val out = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", k = 3,
      threshold = 0.12)
    val ref = Dedup.jaccardPairs(corpus, "doc_id", "text", k = 3,
      threshold = 0.12)
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty)
    assert(out.count() == 1L)
  }

  test("jaccardDedup front door routes by threshold and matches the " +
      "variant it routes to") {
    // routing decisions
    assert(Dedup.jaccardRoute(0.5, None) == "prefix")
    assert(Dedup.jaccardRoute(0.8, Some(64)) == "prefix")
    assert(Dedup.jaccardRoute(0.3, Some(64)) == "inverted-capped")
    assert(Dedup.jaccardRoute(0.3, None) == "inverted-autocap")
    assert(Dedup.jaccardRoute(0.3, None, exact = true) ==
      "inverted-uncapped")
    // high threshold: identical to the prefix variant
    val hi = Dedup.jaccardDedup(docs, "doc_id", "text", k = 3,
      threshold = 0.6)
    val hiRef = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", k = 3,
      threshold = 0.6)
    assert(hi.except(hiRef).isEmpty && hiRef.except(hi).isEmpty)
    // low threshold with a cap: identical to the capped inverted index
    val lo = Dedup.jaccardDedup(docs, "doc_id", "text", k = 3,
      threshold = 0.2, dfCap = Some(16))
    val loRef = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.2, dfCap = Some(16))
    assert(lo.except(loRef).isEmpty && loRef.except(lo).isEmpty)
    // low threshold with explicit exact opt-in: uncapped inverted index
    assert(Dedup.jaccardDedup(docs, "doc_id", "text", k = 3,
      threshold = 0.2, exact = true).count() ==
      Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
        threshold = 0.2).count())
    // low threshold default: capped at the derived p99.9 df — on this
    // corpus (no hot head) the cap keeps everything, so output is the
    // exact set
    assert(Dedup.jaccardDedup(docs, "doc_id", "text", k = 3,
      threshold = 0.2).count() ==
      Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
        threshold = 0.2).count())
  }

  test("derived dfCap bounds hot-shingle pair expansion where uncapped " +
      "blows up") {
    // 200 docs all sharing one hot stopword run (the same 12-word
    // prefix → 10 shingles with df=200) plus a 52-word unique tail
    // (52 df=1 shingles per doc → 10,400 distinct, so the 10 hot
    // shingles are < 0.1% of the population and the p99.9 df is 1).
    // Uncapped, EVERY doc pair co-occurs under the hot shingles:
    // 10 × 200·199/2 ≈ 199k expanded pair rows.
    val hot = (1 to 200).map { i =>
      (i.toLong,
        "the of and to in that it is was for on with " +
          (1 to 52).map(j => s"u${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val cap = Dedup.derivedDfCap(hot, "text", k = 3)
    assert(cap < 200, s"derived cap $cap should exclude the df=200 head")
    // pair expansion under the cap is bounded: candidate groupBy input
    // rows = Σ_capped df·(df−1)/2 — measure via the capped pairs frame
    val capped = Dedup.jaccardPairs(hot, "doc_id", "text", k = 3,
      threshold = 0.05, dfCap = Some(cap)).count()
    val uncapped = Dedup.jaccardPairs(hot, "doc_id", "text", k = 3,
      threshold = 0.05).count()
    // uncapped keeps all 19.9k cross pairs (every pair shares the hot
    // run at jaccard = 10/114 ≥ 0.05); the cap removes the hot shingles
    // so unrelated docs no longer co-occur at all
    assert(uncapped == 200L * 199 / 2,
      s"uncapped should retain every cross pair, got $uncapped")
    assert(capped == 0,
      s"capped expansion should drop hot-only pairs, got $capped")
    // the front door picks the derived cap by default at low thresholds
    assert(Dedup.jaccardDedup(hot, "doc_id", "text", k = 3,
      threshold = 0.05).count() == capped)
  }

  test("decontaminate flags verbatim-overlap docs, counts shared grams") {
    val corpus = Seq(
      // shares the test doc's full 6-word span → 6-4 = wait: k=4 grams
      (1L, "alpha beta gamma delta epsilon zeta unique tail here"),
      (2L, "totally different content with no overlap at all"),
      (3L, "ends with alpha beta gamma delta")) // one shared 4-gram
      .toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, test, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated"))))
      .toMap
    // test doc has 3 distinct 4-grams; doc 1 contains all 3
    assert(out(1L) == ((3L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((1L, true))) // "alpha beta gamma delta"
  }

  test("bloomDedup: no false negatives against history; FP rate near " +
      "the configured bound; history never joined") {
    val history = spark.range(20000)
      .select(concat(lit("hist doc number "), $"id").as("text"))
    // arriving batch: 1000 docs seen before + 5000 genuinely new
    val seen = spark.range(1000)
      .select($"id", concat(lit("hist doc number "), $"id").as("text"))
    val fresh = spark.range(5000)
      .select(($"id" + 1000000L).as("id"),
        concat(lit("brand new doc "), $"id").as("text"))
    val out = Dedup.bloomDedup(seen.unionByName(fresh), history,
      expectedItems = 20000, fpp = 0.01).cache()
    // every historical doc flags (no false negatives, guaranteed)
    assert(out.filter($"id" < 1000000L && !$"seen_before").count() == 0L)
    // false positives on the fresh side stay near 1%
    val fp = out.filter($"id" >= 1000000L && $"seen_before").count()
    assert(fp < 5000 * 0.03, s"false positives: $fp / 5000")
    // the plan joins NOTHING: history folded into the broadcast sketch
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1000))
    out.unpersist()
  }

  test("repeatedSpans finds maximal cross-doc repeated k-gram spans, " +
      "merges touching coverages, ignores within-doc-only repeats") {
    // docs 1 and 2 share the 6-word run "r0 r1 r2 r3 r4 r5" (k = 3 →
    // repeated shingles at word offsets 0..3 of the run); doc 3 is
    // clean; doc 4 repeats a 3-gram only WITHIN itself (not repeated
    // across docs → no span)
    val corpus = Seq(
      (1L, "r0 r1 r2 r3 r4 r5 u1 u2 u3 u4"),
      (2L, "v1 v2 r0 r1 r2 r3 r4 r5 v3 v4"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (4L, "a b c x y z a b c q q q"))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 3)
      .select($"doc_id", $"span_first".cast("long"),
        $"span_last".cast("long"), $"n_hits")
      .orderBy($"doc_id", $"span_first")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: hits at pos 0..3, coverage [0, 5]; doc 2: pos 2..5 → [2, 7]
    assert(out.toSeq == Seq((1L, 0L, 5L, 4L), (2L, 2L, 7L, 4L)))
    // far-apart repeats do NOT merge: split the shared run across a gap
    val gapped = Seq(
      (1L, "r0 r1 r2 g g g g g s0 s1 s2"),
      (2L, "r0 r1 r2 h h h h h s0 s1 s2"))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(gapped, "doc_id", "text", k = 3)
      .filter($"doc_id" === 1L).orderBy($"span_first")
      .select($"span_first".cast("long"), $"span_last".cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(spans.toSeq == Seq((0L, 2L), (8L, 10L)))
  }

  test("cmsHeavyHitters: exact output equals the declarative reference; " +
      "only candidates pay the shuffle") {
    // zipfian-ish stream: item k appears 2000/k times, k = 1..200
    val stream = spark.range(1, 201)
      .select(explode(expr("array_repeat(id, CAST(2000 / id AS INT))"))
        .as("k"))
      .select(concat(lit("item"), $"k").as("item"))
    val minCount = 150L
    val out = Dedup.cmsHeavyHitters(stream, "item", minCount).cache()
    val exact = stream.groupBy($"item").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    // exact equality with the full-shuffle reference: counts AND set
    assert(out.unionByName(exact).except(out.intersect(exact)).count() == 0L)
    assert(out.count() == exact.count())
    // 2000/k >= 150 → k <= 13 heavy items
    assert(out.count() == 13L)
    // the aggregate's input is the sketch-filtered stream, not the raw
    // one: a Filter sits below the partial aggregation
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan.take(1000))
    out.unpersist()
  }

  test("decontaminate withSpans pinpoints the planted contaminated span") {
    // doc 1: 4 clean words, then the 6-word test span at words [4, 9],
    // then a clean tail; k = 3 → matching shingles at positions 4..7,
    // span_last = 7 + 2 = 9: words [4, 9] excise the whole match
    val corpus = Seq(
      (1L, "w0 w1 w2 w3 alpha beta gamma delta epsilon zeta t0 t1"),
      (2L, "clean document with nothing shared anywhere at all"),
      // doc 3: the SAME shared 3-gram appears twice (positions 1, 5) —
      // duplicate hashes must widen the span but count once
      (3L, "x0 alpha beta gamma x1 alpha beta gamma x2"))
      .toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, test, "doc_id", "text", k = 3,
      withSpans = true).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_shared"),
        r.getAs[Boolean]("contaminated"),
        Option(r.getAs[Integer]("span_first")),
        Option(r.getAs[Integer]("span_last"))))).toMap
    assert(out(1L) == ((4L, true, Some(4), Some(9))))
    assert(out(2L) == ((0L, false, None, None)))
    assert(out(3L) == ((1L, true, Some(1), Some(7))))
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

  /** The hot-bucket guard on the simhash surface — the boilerplate-text
    * analogue of PhashSpec's blank-frame cap test: 40 byte-identical
    * boilerplate docs collide into one (band, chunk) bucket per band
    * that would expand quadratically; maxBucket drops those buckets
    * while a genuine near-dup pair in a small bucket survives. */
  test("simHashCandidates maxBucket drops boilerplate buckets only") {
    val boiler =
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val uniq =
      "a genuinely distinctive longer document about engine internals"
    val rows = (0L until 40L).map(i => (i, boiler)) ++
      Seq((100L, uniq), (101L, uniq))
    val df = rows.toDF("doc_id", "text")
    val uncapped = Dedup.simHashCandidates(df, "doc_id", "text")
    assert(uncapped.count() == 40L * 39 / 2 + 1)
    val capped = Dedup
      .simHashCandidates(df, "doc_id", "text", maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"got $capped")
  }

  /** The capped band path's design claim, pinned mechanically: the
    * upstream feeding the band index is computed EXACTLY once per row
    * (the lazily checkpointed frame serves both the bucket census and
    * the anti-join) — a regression to the two-pass census would double
    * the accumulator, a window-census regression would keep it at one
    * pass but lose the map-side drop (covered by the cap tests). */
  test("capped band candidates compute the upstream once per row") {
    val counter = spark.sparkContext.longAccumulator("upstream_rows")
    val tap = udf((x: Long) => { counter.add(1L); x }).asNondeterministic()
    // 30 unique hashes + 40 clones of one hash (a hot bucket at cap 8)
    val rows = spark.range(70).select(col("id"),
      tap(when(col("id") < 30, col("id") * 1099511627776L)
        .otherwise(lit(0xDEADBEEFL))).as("ph"))
    val n = Phash.hammingCandidates(rows, "id", "ph",
      maxDist = 3, maxBucket = Some(8)).count()
    // the clone blob is capped out of every band it saturates
    assert(n == 0L, s"expected no pairs, got $n")
    assert(counter.value == 70L,
      s"upstream evaluated ${counter.value} times for 70 rows")
  }

  test("deterministic signatures across runs") {
    val s1 = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val s2 = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(s1 == s2)
  }

  test("components: a chain a-b, b-c, c-d collapses to one component") {
    val pairs = Seq((2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val comps = Dedup.components(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(comps == Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("components: separate clusters, long path, reversed pair order") {
    // one 3-cluster given in arbitrary orientation, one 2-cluster, and a
    // 64-node path (diameter 63 — needs the pointer-doubling shortcut to
    // converge inside the round guard at maxRounds = 10)
    val path = (100L until 163L).map(i => (i + 1, i))
    val pairs = (Seq((7L, 9L), (9L, 8L), (20L, 21L)) ++ path)
      .toDF("id_a", "id_b")
    val comps = Dedup.components(pairs, maxRounds = 10).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(comps(7L) == 7L && comps(8L) == 7L && comps(9L) == 7L)
    assert(comps(20L) == 20L && comps(21L) == 20L)
    assert((100L to 163L).forall(comps(_) == 100L))
  }

  test("canonicalize: quality winner per component, singletons kept") {
    val corpus = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 30L), // one component
      (4L, "d", 99L)) // never paired
      .toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(corpus, pairs, "doc_id",
      qualityCol = Some("quality")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("canonical_id"),
          r.getAs[Boolean]("is_canonical")))).toMap
    // max quality 30 is tied between 2 and 3 -> min id 2 wins
    assert(out(1L) == ((1L, 2L, false)))
    assert(out(2L) == ((1L, 2L, true)))
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true))) // own singleton component
    // without a quality column the min id wins instead
    val minOut = Dedup.canonicalize(corpus, pairs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_canonical")).toMap
    assert(minOut == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("components on string ids") {
    val pairs = Seq(("x", "m"), ("m", "q")).toDF("id_a", "id_b")
    val comps = Dedup.components(pairs).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("component"))
      .toMap
    assert(comps == Map("x" -> "m", "m" -> "m", "q" -> "m"))
  }

  test("dedupLines drops cross-doc boilerplate, keeps order, keeps " +
      "all-boilerplate docs as empty rows") {
    val multi = Seq(
      (1L, "COPYRIGHT 2026\nunique first line\nshared middle\nend one"),
      (2L, "copyright 2026\nanother body line\nshared middle\nend two"),
      (3L, "Copyright 2026  \nthird doc content here"),
      (4L, "copyright 2026")) // nothing but boilerplate
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"))).toMap
    // "copyright 2026" normalizes identically across case/trailing
    // space in 4 docs; "shared middle" is in 2 docs — both dropped.
    assert(out(1L) == (("unique first line\nend one", 2L, 2L)))
    assert(out(2L) == (("another body line\nend two", 2L, 2L)))
    assert(out(3L) == (("third doc content here", 1L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))
    // a line repeated WITHIN one doc only does not count as cross-doc
    val within = Seq(
      (1L, "same line\nsame line\nother"),
      (2L, "different content entirely"))
      .toDF("doc_id", "text")
    val w = Dedup.dedupLines(within, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    assert(w(1L) == "same line\nsame line\nother")
  }

  test("editDistancePairs: all single-edit kinds found, ed=2 excluded") {
    val names = Seq(
      (1L, "spark"), (2L, "spork"),   // substitution
      (3L, "sparks"),                 // insertion vs 1
      (4L, "park"),                   // deletion vs 1
      (5L, "spark"),                  // exact duplicate of 1
      (6L, "ab"), (7L, "ba"),         // shared deletion set, ed=2
      (8L, "zzzzz")                   // unrelated
    ).toDF("id", "nm")
    val got = Dedup.editDistancePairs(names, "id", "nm")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got((1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 1L)
    assert(got((1L, 4L)) == 1L)
    assert(got((1L, 5L)) == 0L)
    assert(!got.contains((6L, 7L))) // levenshtein verify kills it
    assert(!got.keySet.exists { case (a, b) => a == 8L || b == 8L })
    // completeness: equals the brute-force cross compare on real names
    val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select($"c_custkey".as("id"), $"c_name".as("nm"))
    val fast = Dedup.editDistancePairs(cust, "id", "nm")
    val brute = cust.as("a").join(cust.as("b"), $"a.id" < $"b.id")
      .withColumn("dist", levenshtein($"a.nm", $"b.nm").cast("long"))
      .filter($"dist" <= 1)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"), $"dist")
    assert(fast.count() > 0)
    assert(fast.except(brute).isEmpty && brute.except(fast).isEmpty)
  }

  test("containment pairs are asymmetric: sub-document scores 1 one way") {
    // doc 11 is a verbatim sub-span of the much longer doc 10
    val sub = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "wholly unrelated text about columnar shuffles and joins"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(sub, "doc_id", "text", k = 3,
        threshold = 0.1).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("containment")).toMap
    // short side fully contained; long side only partially
    assert(got((11L, 10L)) == 1.0)
    assert(got((10L, 11L)) < 0.5 && got((10L, 11L)) > 0.0)
    assert(!got.keySet.exists { case (a, b) => a == 12L || b == 12L })
    // exact value: doc 11 has 6 shingles, doc 10 has 18, all 6 shared
    assert(got((10L, 11L)) == 6.0 / 18.0)
  }

  /** Incremental dedup against a persisted index: old-vs-old pairs are
    * settled at index-build time and must NEVER reappear; new docs pair
    * against the corpus (vs_corpus) and each other (vs_batch); the
    * corpus-side probe is a broadcast hash join (the corpus never
    * shuffles for a daily batch). */
  test("incrementalCandidates: no old-vs-old, both probe kinds, " +
      "broadcast probe plan") {
    // corpus: 1≈2 near-dups (must NOT appear), 4 unrelated
    // batch: 103 ≈ corpus 3's text (vs_corpus), 103≈104 (vs_batch)
    val base = "the quick brown fox jumps over the lazy dog near " +
      "the river bank"
    val corpus = Seq(
      (1L, s"$base today"), (2L, s"$base today"), (3L, s"$base now"),
      (4L, "completely different content about spark query engines " +
        "and shuffles everywhere")).toDF("doc_id", "text")
    val batch = Seq(
      (103L, s"$base now"), (104L, s"$base nowish"),
      (105L, "another unrelated doc mentioning columnar storage " +
        "formats exclusively")).toDF("doc_id", "text")
    val index = Dedup.minHashIndex(corpus, "doc_id", "text")
    val out = Dedup.incrementalCandidates(index, batch, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val got = out.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[String]("kind")))
      .toSet
    // the settled corpus pair (1,2) is absent in any orientation
    assert(!got.exists { case (a, b, _) =>
      Set(a, b).subsetOf(Set(1L, 2L)) })
    // exact text match corpus 3 × batch 103 must band-collide
    assert(got.exists { case (a, b, k) =>
      a == 3L && b == 103L && k == "vs_corpus" })
    // near-dup within the batch
    assert(got.exists { case (a, b, k) =>
      a == 103L && b == 104L && k == "vs_batch" })
    // est_jaccard of the exact-text vs_corpus pair is 1.0
    val ej = out.filter($"id_a" === 3L && $"id_b" === 103L)
      .select($"est_jaccard").as[Double].head()
    assert(ej == 1.0)
  }
}
