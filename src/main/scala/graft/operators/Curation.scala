package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * hash splits (train/val/test that never move when the corpus grows),
  * per-group stratified down-sampling, and per-group quota capping.
  *
  * All assignment decisions derive from splitmix64 of a stable row id —
  * pure codegen'd column arithmetic, zero shuffle, and engine-portable
  * (the DuckDB oracles replay the mixer in UHUGEINT arithmetic), which
  * is what makes the splits REPRODUCIBLE: re-running on a grown corpus
  * keeps every existing row's split, where `rand()`-based sampling
  * reshuffles everything. That stability is the operative requirement
  * for held-out sets at 100 TB.
  */
object Curation {

  /** splitmix64 finalizer as a column composition (wrap-around 64-bit
    * multiplies — sessions run ANSI off; see graft.Q.sessionConfigs). */
  def splitmix(x: Column): Column = {
    val seeded = x + lit(0x9e3779b97f4a7c15L)
    val z1 = (seeded.bitwiseXOR(shiftrightunsigned(seeded, 30))) *
      lit(0xbf58476d1ce4e5b9L)
    val z2 = (z1.bitwiseXOR(shiftrightunsigned(z1, 27))) *
      lit(0x94d049bb133111ebL)
    z2.bitwiseXOR(shiftrightunsigned(z2, 31))
  }

  /** Buckets per split universe: assignments quantize to 1/10000. */
  val Buckets = 10000

  /** Non-negative bucket in [0, Buckets): low 53 bits of the mix (so the
    * value is positive in SIGNED arithmetic too — the oracle's unsigned
    * modulo then agrees bit-for-bit) modulo the bucket count. */
  def hashBucket(id: Column): Column =
    pmod(splitmix(id).bitwiseAND(lit((1L << 53) - 1)), lit(Buckets.toLong))

  /** Deterministic split assignment: `splits` are (label, weight) pairs
    * (weights sum to ≤ 1; quantized to 1/10000). A row's label depends
    * ONLY on its id — growing or re-partitioning the corpus never moves
    * an existing row between splits. Zero shuffle. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split weights sum to $total > 1")
    val b = hashBucket(col(idCol))
    val cuts = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Buckets)
    }.tail
    val assigned = splits.zip(cuts).foldLeft(
      lit(null).cast("string")) { case (acc, ((label, _), cut)) =>
      when(acc.isNotNull, acc).otherwise(when(b < cut, label))
    }
    df.withColumn(outCol, assigned)
  }

  /** Stratified deterministic down-sampling: keep a row iff its hash
    * bucket falls under its group's rate (groups absent from `rates`
    * keep everything). The per-group keep set is again a pure function
    * of row ids — stable under corpus growth. Zero shuffle. */
  def sampleByGroup(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double]): DataFrame = {
    val b = hashBucket(col(idCol))
    val cut = rates.toSeq.sortBy(_._1).foldLeft(lit(Buckets.toLong)) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, math.round(r * Buckets)).otherwise(acc)
    }
    df.filter(b < cut)
  }

  /** Per-group quota cap: keep at most `quota` rows per group, by
    * ascending `priority` (ties broken by `idCol` — a total order, so
    * the kept set is deterministic). Uses the bounded-heap TopKAgg: the
    * map side retains ≤ quota rows per (partition, group), so a hot
    * group ships quota·partitions rows instead of ALL its rows to one
    * task — the reason this survives a 100 TB group where a
    * `row_number` window cannot. Returns (groupCol, idCol, rank). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, priority: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg.topK(
        struct(priority.as("p"), col(idCol).as("id")),
        struct(col(idCol).as("id")), quota).as("kept"))
      .select(col(groupCol), posexplode(col("kept")).as(Seq("r", "row")))
      .select(col(groupCol), col("row.id").as(idCol),
        (col("r") + 1).cast("long").as("rank"))

  /** GPT-style sequence packing: concatenate every document's tokens in
    * `idCol` order into one virtual stream and cut it into fixed
    * `contextLen`-token training contexts. Each document gets its global
    * `token_offset` (exclusive prefix sum of `tokensCol` — the scale
    * path is [[Ranks.withGlobalPrefixSum]]'s zipWithIndex shape, ONE
    * range shuffle at any corpus size, never a single-partition window)
    * and the `chunk_start`/`chunk_end` context ids it lands in. Empty
    * documents collapse to a degenerate [chunk_start, chunk_start]
    * span. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      contextLen: Int): DataFrame =
    Ranks.withGlobalPrefixSum(
      df.withColumn("n_tokens", tokensCol.cast("long")),
      Seq(col(idCol)), "n_tokens", "token_offset", exclusive = true)
      .withColumn("chunk_start",
        expr(s"token_offset div $contextLen"))
      .withColumn("chunk_end",
        when(col("n_tokens") > 0,
          expr(s"(token_offset + n_tokens - 1) div $contextLen"))
          .otherwise(col("chunk_start")))

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * the A-ES one-pass scheme): each row gets a deterministic uniform
    * u ∈ (0,1) from splitmix64 of its id (low 53 bits + 0.5, over
    * 2^53 — exact in double on any engine), a key ln(u)/w, and the k
    * LARGEST keys are the sample — provably equivalent to drawing k
    * rows one by one with probability ∝ weight, but embarrassingly
    * parallel. Deterministic and reproducible: the same corpus always
    * yields the same sample, and the DuckDB oracle replays it.
    *
    * Scale: one pass + one bounded-heap [[graft.functions.TopKAgg]]
    * merge (≤ k rows per partition move) — no global sort, no
    * single-partition window. Returns (idCol, es_key, rank). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    val u = (splitmix(col(idCol)).bitwiseAND(lit((1L << 53) - 1))
      .cast("double") + 0.5) / math.pow(2.0, 53)
    val key = log(u) / weight
    df.select(col(idCol).as("id"), key.as("key"))
      .groupBy()
      .agg(graft.functions.TopKAgg.topK(
        struct((-col("key")).as("nk"), col("id").as("id")),
        struct(col("id").as("id"), col("key").as("key")), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r", "hit")))
      .select(col("hit.id").as(idCol), col("hit.key").as("es_key"),
        (col("r") + 1).cast("long").as("rank"))
  }

  /** Sliding-window context chunking (the RAG / long-doc pretraining
    * splitter): cut each document's token stream into windows of
    * `window` tokens every `stride` tokens (overlap = window − stride).
    * One row per chunk: (idCol, chunk_id, start_tok, end_tok, n_toks),
    * end-exclusive, last chunk truncated at the document end; empty
    * documents produce no chunks. Pure integer row-local `sequence` +
    * `explode` — zero shuffle, linear to 100 TB. */
  def chunkSpans(df: DataFrame, idCol: String, tokensCol: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    // last start = smallest stride multiple whose window reaches the
    // end — no redundant tail chunk fully contained in its predecessor
    val lastStart = when(col("n_tokens") > window,
      expr(s"((n_tokens - $window + ${stride - 1}) div $stride)" +
        s" * $stride"))
      .otherwise(lit(0L))
    df.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L), lastStart,
          lit(stride.toLong))).as("start_tok"))
      .select(col(idCol),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        col("start_tok"),
        least(col("start_tok") + window, col("n_tokens")).as("end_tok"))
      .withColumn("n_toks", col("end_tok") - col("start_tok"))
  }

  /** Temperature-weighted mixture sampling (the multilingual-LM
    * rebalancing rule, e.g. XLM-R / mT5: target share ∝ w^α where w is
    * a source's natural share). Down-sampling only — the smallest
    * source keeps 100% and every source s keeps
    * rate_s = (n_min / n_s)^(1-α), which makes the kept mixture
    * exactly ∝ w^α with no upsampling. The keep decision reuses the
    * stable [[hashBucket]] universe (bucket < round(rate·10000)), so
    * kept sets are reproducible and never move when the corpus grows
    * (beyond the rate shift a changed census implies).
    *
    * α = 0.5 is the bit-exact sweet spot: (n_min/n_s)^0.5 is one IEEE
    * sqrt of an exact integer ratio, identical on every engine (the
    * oracle replays it); other α go through pow (last-ulp variance
    * across libms — fine in production, kept out of the hash gate).
    *
    * Scale: ONE map-side-combined census aggregation (KB: one row per
    * source) round-trips the driver, then a zero-shuffle codegen'd
    * filter. Emits (idCol, groupCol, bucket, rate_bp, keep). */
  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): documents are featurized as HASHED word-bigram
    * bucket counts, add-1-smoothed bag-of-buckets models are fit on the
    * target slice (`targetCol` = boolean) and on the full raw pool, and
    * each document's importance weight is its feature log-likelihood
    * ratio  Σ_grams [ln p_target(b) − ln p_raw(b)].  Positive = more
    * target-like than the pool average.
    *
    * Scale shape: the two models TOGETHER are one `buckets`-row count
    * table (hashing is what bounds the feature space — DSIR's own
    * trick), built with one bucket-keyed shuffle and then BROADCAST to
    * the scoring join; scoring itself is one doc-keyed aggregation. No
    * vocabulary table, no per-word state, nothing grows with corpus
    * size except the two streams.
    *
    * Returns (idCol, n_grams, log_ratio) — resample from it with
    * [[weightedSample]] / [[temperatureSample]], or threshold at 0. */
  def dsirLogRatios(docs: DataFrame, idCol: String, targetCol: String,
      textCol: String = "text", buckets: Int = 2048): DataFrame = {
    val b = buckets.toLong
    val bg = docs.select(col(idCol), col(targetCol).as("is_t"),
        explode(graft.functions.Expressions.wordShingleHashesAt(
          col(textCol), 2)).as("h"))
      .withColumn("bkt", pmod(col("h"), lit(b)))
    val counts = bg.groupBy(col("bkt")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val model = broadcast(counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((col("ct") + 1.0) / (col("nt") + b.toDouble)) -
          log((col("cr") + 1.0) / (col("nr") + b.toDouble))).as("lr")))
    bg.join(model, Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr")).as("log_ratio"))
  }

  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0,1]")
    // KB-scale driver scalar boundary: one (source, count) row per source
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0).toString -> r.getLong(1))
    val nMin = counts.map(_._2).min
    val rateBp = counts.map { case (g, n) =>
      val r =
        if (alpha == 0.5) math.sqrt(nMin.toDouble / n)
        else math.pow(nMin.toDouble / n, 1.0 - alpha)
      g -> math.floor(r * Buckets + 0.5).toLong
    }.sortBy(_._1)
    val cut = rateBp.foldLeft(lit(Buckets.toLong)) {
      case (acc, (g, bp)) =>
        when(col(groupCol) === g, lit(bp)).otherwise(acc)
    }
    df.select(col(idCol), col(groupCol),
      hashBucket(col(idCol)).as("bucket"))
      .withColumn("rate_bp", cut)
      .withColumn("keep", col("bucket") < col("rate_bp"))
  }

  /** Per-group rank buckets — the CCNet head/middle/tail move
    * generalized: every row gets its 1-based `rank` inside its group
    * under `orderCols` (which MUST be a total order — include an id
    * tiebreak) and the ceil-quantile bucket
    * `b = ceil(rank · nBuckets / n) = (rank·k + n − 1) div n` ∈ [1, k].
    * Integer arithmetic end to end, so bucket boundaries can never flip
    * on a float ulp.
    *
    * Scale shape: the rank comes from the partition-offset prefix sum
    * ([[Ranks.withGlobalPrefixSum]] over (group, orderCols) — ONE range
    * shuffle at any size), NOT a per-group `row_number` window whose hot
    * group would pin a whole language's corpus in one task. Group
    * starts/sizes are a |groups|-row frame broadcast back. */
  def rankBuckets(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      nBuckets: Int, rankCol: String = "rank",
      bucketCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val one = df.withColumn("_one", lit(1L))
    val idx = Ranks.withGlobalPrefixSum(one,
      col(groupCol) +: orderCols, valueCol = "_one", outCol = "_gidx")
    val starts = idx.groupBy(col(groupCol))
      .agg(min(col("_gidx")).as("_start"), count(lit(1)).as("_n"))
    idx.join(broadcast(starts), Seq(groupCol))
      .withColumn(rankCol, col("_gidx") - col("_start") + lit(1L))
      .withColumn(bucketCol,
        expr(s"($rankCol * $nBuckets + _n - 1) div _n"))
      .drop("_one", "_gidx", "_start", "_n")
  }

  /** Token-budget corpus mixing with up-/down-sampling epochs (the
    * Pile/Dolma recipe): given integer basis-point weights per source
    * and a total token budget, source s with A_s available tokens owes
    * `target_s = (budget · bp_s) div 10000`. A source short of its
    * target repeats `target div A_s` whole epochs and tops up the
    * remainder with a DETERMINISTIC splitmix doc sample at
    * `rem_bp = (target mod A_s)·10000 div A_s`; an oversupplied source
    * gets zero full epochs and the same partial-epoch sampling. All
    * arithmetic stays BIGINT div/mod — no float shares whose last ulp
    * could flip a document — so the realized mix is a pure function of
    * ids and reproduces byte-identically on any cluster, and appending
    * to one source never reshuffles another's sample.
    *
    * Returns one row per source — the UNION of observed sources and
    * weight keys, so a weighted source missing from the corpus
    * surfaces as an `available_tokens = 0, target_tokens > 0,
    * effective_tokens = 0` shortfall row: `available_docs,
    * available_tokens, target_tokens, full_epochs, rem_bp, rem_docs,
    * rem_tokens, effective_tokens` (= epochs·A + realized remainder).
    *
    * Scale shape: one map-side-combined per-source agg, a |sources|-row
    * plan frame broadcast back, one corpus filter+agg for the realized
    * remainder — two small shuffles, no window, no collect. */
  def mixWithEpochs(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: Column, weightsBp: Seq[(String, Long)],
      budgetTokens: Long): DataFrame = {
    // a duplicated key would double-count toward the 10000bp cap while
    // only one when-branch could ever win — reject it outright
    require(weightsBp.map(_._1).distinct.size == weightsBp.size,
      "duplicate mix weight keys: " + weightsBp.map(_._1).diff(
        weightsBp.map(_._1).distinct).distinct.mkString(", "))
    require(weightsBp.map(_._2).sum <= 10000L,
      "mix weights exceed 10000 bp")
    val perDoc = df.select(col(idCol).as("_id"),
      col(groupCol).as("_g"), tokensCol.cast("long").as("_tk"))
    // FULL OUTER with the weight table (broadcast-sized: |sources|
    // rows): a source named in weightsBp but ABSENT from the corpus
    // (typo'd name, empty shard) still emits a row — available 0,
    // target > 0, effective 0 — so a budget shortfall is visible in
    // the plan output instead of silently under-spending.
    val wdf = {
      import df.sparkSession.implicits._
      weightsBp.toDF("_g", "_bp")
    }
    val plan = perDoc.groupBy(col("_g"))
      .agg(count(lit(1)).as("available_docs"),
        sum(col("_tk")).as("available_tokens"))
      .join(wdf, Seq("_g"), "full_outer")
      .withColumn("_bp", coalesce(col("_bp"), lit(0L)))
      .withColumn("available_docs",
        coalesce(col("available_docs"), lit(0L)))
      .withColumn("available_tokens",
        coalesce(col("available_tokens"), lit(0L)))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * _bp) div 10000"))
      .withColumn("full_epochs",
        when(col("available_tokens") > 0,
          expr("target_tokens div available_tokens")).otherwise(lit(0L)))
      .withColumn("rem_bp",
        when(col("available_tokens") > 0,
          expr("((target_tokens % available_tokens) * 10000)" +
            " div available_tokens")).otherwise(lit(0L)))
    val rem = perDoc
      .join(broadcast(plan.select(col("_g"), col("rem_bp"))), Seq("_g"))
      .filter(hashBucket(col("_id")) < col("rem_bp"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("rem_docs"), sum(col("_tk")).as("rem_tokens"))
    plan.join(rem, Seq("_g"), "left")
      .withColumn("rem_docs", coalesce(col("rem_docs"), lit(0L)))
      .withColumn("rem_tokens", coalesce(col("rem_tokens"), lit(0L)))
      .withColumn("effective_tokens",
        col("full_epochs") * col("available_tokens") + col("rem_tokens"))
      .select(col("_g").as(groupCol), col("available_docs"),
        col("available_tokens"), col("target_tokens"),
        col("full_epochs"), col("rem_bp"), col("rem_docs"),
        col("rem_tokens"), col("effective_tokens"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle a split boundary — a validation doc whose near-dup
    * twin sits in train silently inflates every eval it touches (the
    * contamination failure dedup-aware pipelines exist to prevent; cf.
    * the decontamination op, which guards against TEST-set leakage the
    * same way this guards against intra-corpus leakage). Every document
    * therefore inherits its near-dup COMPONENT's split: components come
    * from the pair frame ([[Dedup.components]], O(log diameter)
    * min-label rounds), pair-free docs are their own singleton
    * component, and the deterministic splitmix bucket is taken on the
    * component id — the whole cluster moves together, and assignment
    * stays a pure function of ids (appending corpus can only MERGE
    * components, never re-roll an untouched cluster's dice).
    *
    * Scale shape: after components, ONE docs×labels left join on the id
    * hash partitioning plus a row-local bucket expression — no window,
    * no collect, no pair re-materialization. */
  def leakageSafeSplit(corpus: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Double)], idACol: String = "id_a",
      idBCol: String = "id_b", outCol: String = "split"): DataFrame = {
    val comps = Dedup.components(pairs, idACol, idBCol)
      .select(col("id").as(idCol), col("component"))
    val withComp = corpus.join(comps, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    hashSplit(withComp, "component", splits, outCol)
  }

  /** Length-bucketed inference/training batching: group rows of similar
    * token length into fixed-size batches so each batch pads only to
    * ITS max, not the corpus max — the standard dynamic-padding
    * efficiency lever (a batch's compute is batchSize × its longest
    * member; mixing a 10-token doc into a 500-token batch wastes 98%
    * of its rows' compute).
    *
    * Scale shape: rows hash-shuffle ONCE on the integer length bucket
    * (`len div bucketWidth` — a bounded-domain key), ordering runs
    * per-bucket (parallel across buckets, never a global sort), and
    * batch ids derive from the in-bucket row_number — position div
    * batchSize — so batch membership is deterministic (tie-break by
    * id) and any engine replays it. A giant corpus slice landing in
    * one bucket makes that bucket's window the straggler; pick
    * bucketWidth so buckets stay task-sized, or pre-salt the dominant
    * bucket. Padding waste per batch = batchSize·max(len) − Σ len for
    * full batches (max·count − Σ for the bucket's trailing partial
    * batch) — all integer. Returns one row per input row:
    * (id, len, bucket, batch_id) with batch_id unique across buckets
    * (bucket · 2^20 + in-bucket batch index, guarded). */
  def lengthBucketedBatches(df: DataFrame, idCol: String, lenCol: Column,
      batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize > 0 && bucketWidth > 0,
      "batchSize and bucketWidth must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("len"), col("id"))
    df.select(col(idCol).as("id"), lenCol.cast("long").as("len"))
      .withColumn("bucket", expr(s"len div $bucketWidth"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      // 2^20 in-bucket batches max AND bucket < 2^43: both halves of
      // the packed id fail loudly before they can collide or overflow
      // Long (an extreme len makes bucket = len div bucketWidth huge;
      // bucket·2^20 would silently wrap negative without the guard)
      .withColumn("batch_id", when(
        assert_true(expr(s"pos div $batchSize") < (1L << 20) &&
            col("bucket") < (1L << 43),
          lit("bucket overflows the packed batch id; " +
            "raise bucketWidth or split the input")).isNull,
        col("bucket") * (1L << 20) + expr(s"pos div $batchSize")))
      .select(col("id"), col("len"), col("bucket"), col("batch_id"))
  }

  /** Temporal embargo split — the third leakage-prevention discipline
    * beside [[hashSplit]] (random-by-id) and
    * [[leakageSafeSplit]] (similarity-component-atomic): for
    * event-ordered data, test rows must come strictly AFTER training
    * rows, with an embargo gap between them so nothing that straddles
    * the boundary (sessions, trailing aggregates, label windows) leaks
    * future information into training (the purged/embargoed split of
    * de Prado 2018). The boundary is INTEGER microseconds —
    * `lo + (hi−lo)·trainPct div 100` over the observed span — so the
    * assignment is deterministic, engine-portable, and stable under
    * any partitioning; rows in `(boundary, boundary + embargo]` are
    * labeled `embargo` and dropped from both sides. Rows with a NULL
    * timestamp are labeled `unknown` — silently defaulting them into
    * `test` (what a bare otherwise-branch does) would defeat the very
    * leakage discipline this operator exists for. Row-local after
    * one tiny min/max broadcast — zero shuffles of the data itself. */
  def temporalEmbargoSplit(df: DataFrame, tsCol: Column,
      trainPct: Int = 80, embargoUs: Long = 0L,
      outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"trainPct ($trainPct) must be in (0, 100)")
    require(embargoUs >= 0, "embargoUs must be non-negative")
    val us = unix_micros(tsCol)
    val mm = df.agg(min(us).as("lo"), max(us).as("hi"))
    df.crossJoin(broadcast(mm))
      .withColumn("__b",
        expr(s"lo + (hi - lo) * $trainPct div 100"))
      .withColumn(outCol,
        when(us.isNull, "unknown")
          .when(us <= col("__b"), "train")
          .when(us <= col("__b") + lit(embargoUs), "embargo")
          .otherwise("test"))
      .drop("lo", "hi", "__b")
  }

  /** Quasi-identifier equivalence classes — the shared primitive of the
    * privacy release audits (q171 k-anonymity, q173 l-diversity): one
    * row per distinct combination of the `qi` columns with the class
    * size `sz`, plus `l_div` (distinct values of the sensitive column
    * inside the class) when a sensitive attribute is given. One
    * map-side-combinable aggregate; never touches content columns, so
    * at corpus scale it shuffles only the (tiny) QI key space. Callers
    * roll the class frame up to their released slices (min sz = the
    * slice's k-anonymity; min l_div = its l-diversity; conditional sums
    * = suppression cost). */
  def equivalenceClasses(df: DataFrame, qi: Seq[Column],
      sensitive: Option[Column] = None): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    val aggs = count(lit(1)).as("sz") +:
      sensitive.map(s => countDistinct(s).as("l_div")).toSeq
    df.groupBy(qi: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Padding-waste census over a batch assignment (id, len, batch_id):
    * per batch the pad cost is max(len)·n − Σ len; returns ONE row —
    * (n_batches, n_rows, total_tokens, total_padding) — for comparing
    * batching strategies. */
  def paddingCensus(batches: DataFrame): DataFrame =
    batches.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n"), max(col("len")).as("mx"),
        sum(col("len")).as("s"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("n")).as("n_rows"),
        sum(col("s")).as("total_tokens"),
        sum(col("mx") * col("n") - col("s")).as("total_padding"))
}
