package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLmScore: hand-computed LM on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs)
      .orderBy("doc_id").collect()
    // bigrams: d1 (a,b),(b,a); d2 (a,b) → C(a,b)=2, C(b,a)=1,
    // Cctx(a)=2, Cctx(b)=1, V=3 (a, b, z)
    val pBgivenA = (2.0 + 1.0) / (2.0 + 3.0)
    val pAgivenB = (1.0 + 1.0) / (1.0 + 3.0)
    val lp1 = math.log(pBgivenA) + math.log(pAgivenB)
    assert(got.length == 3)
    val r1 = got(0)
    assert(r1.getLong(1) == 2L)
    assert(math.abs(r1.getDouble(2) - lp1) < 1e-12)
    assert(math.abs(r1.getDouble(3) - (-lp1 / 2)) < 1e-12)
    assert(math.abs(r1.getDouble(4) - math.exp(-lp1 / 2)) < 1e-12)
    val r2 = got(1)
    assert(r2.getLong(1) == 1L)
    assert(math.abs(r2.getDouble(2) - math.log(pBgivenA)) < 1e-12)
    // a single-token doc has no bigrams → NULL scores, n_bigrams 0
    val r3 = got(2)
    assert(r3.getLong(1) == 0L && r3.isNullAt(2) && r3.isNullAt(3))
  }

  test("bpeTrain: hand-computed merges on the Sennrich toy corpus") {
    // word freqs: low×5, lower×2, newest×6, widest×3 (one doc per copy)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // pair counts round 1: (e,s) 9, (s,t) 9, (e,w) 6, (n,e) 6, (l,o) 7,
    // (o,w) 7, (w,e) 8, ... argmax ties (e,s)/(s,t) at 9 → lexicographic
    // smaller pair (e,s) first
    assert(merges(0) == ((1L, "e", "s", "es", 9L)))
    // round 2: (es,t) 9 wins
    assert(merges(1) == ((2L, "es", "t", "est", 9L)))
    // round 3: w-e in newest is gone (n,e)(e,w) intact: (e,w) 6, (n,e) 6,
    // (l,o) 7, (o,w) 7, (w,est) 3+6=9? newest = n e w est → (w,est) 6;
    // widest = w i d est → (d,est) 3; so max is (l,o)/(o,w) at 7 →
    // (l,o) lexicographically first
    assert(merges(2) == ((3L, "l", "o", "lo", 7L)))
    assert(merges(3) == ((4L, "lo", "w", "low", 7L)))
  }

  test("bpeTrain: merge count capped by distinct pair supply") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // only one pair (a,b) exists; after merging it no pairs remain →
    // training stops early instead of emitting degenerate rows
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 10).collect()
    assert(merges.length == 1)
  }

  test("bpeEncode: token counts shrink monotonically with merges and " +
      "match hand-encoding") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // merges: (e,s)(es,t)(l,o)(lo,w) → low = [low] (1 tok),
    // lower = [low, e, r] (3), newest = [n, e, w, est] (4),
    // widest = [w, i, d, est] (4)
    val enc = TextAnalysis.bpeEncode(docs, merges)
      .select("text", "n_tokens_bpe").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc == Map("low" -> 1L, "lower" -> 3L, "newest" -> 4L,
      "widest" -> 4L))
    // zero merges = character tokenization
    val chars = TextAnalysis.bpeEncode(docs, Nil)
      .select("text", "n_tokens_bpe").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chars("newest") == 6L && chars("low") == 3L)
    // multi-word doc: counts add up per word, never merge across words
    val two = Seq((1L, "low low")).toDF("doc_id", "text")
    val e2 = TextAnalysis.bpeEncode(two, merges).head()
    assert(e2.getAs[Long]("n_tokens_bpe") == 2L)
  }

  test("text operators survive null and empty text rows") {
    // a lakehouse lands dirty rows; row-local operators must pass
    // them through (null/zero outputs), never throw
    val docs = Seq((1L, "a b a"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLmScore(docs).orderBy("doc_id").collect()
    assert(lm.length == 3)
    assert(lm(0).getLong(1) == 2L)
    assert(lm(1).getLong(1) == 0L && lm(2).getLong(1) == 0L)
    // words are single chars here, so the (a,b) merge never applies
    // (merges are intra-word): "a b a" stays 3 tokens
    val enc = TextAnalysis.bpeEncode(docs, Seq(("a", "b")))
      .orderBy("doc_id").collect()
    assert(enc(0).getAs[Long]("n_tokens_bpe") == 3L)
    assert(enc.length == 3) // null/empty rows pass through, no throw
    val redacted = TextAnalysis.redactPii(docs).collect()
    assert(redacted.length == 3)
    val rep = TextAnalysis.repetitionStats(docs).collect()
    assert(rep.length == 3)
    val fp = docs.select(TextAnalysis.prefixFingerprint($"text"))
      .collect()
    assert(fp.length == 3)
    // BPE training ignores null/empty rows
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 3)
    assert(merges.count() >= 0L)
  }

  test("bigramLmScore: smoothed probabilities sum to 1 over the vocab") {
    val docs = Seq((1L, "a b a c"), (2L, "b c a a")).toDF("doc_id", "text")
    // Σ_w2∈V P(w2|w1) = (Cctx(w1) + k·V) / (Cctx(w1) + k·V) = 1 by
    // construction; verify through the scored frame: each observed
    // bigram probability must be in (0, 1) and a doc repeating one
    // bigram scores exactly n · ln P of it.
    val rep = Seq((9L, "a b a b a b")).toDF("doc_id", "text")
    val both = TextAnalysis.bigramLmScore(docs.unionByName(rep))
      .filter($"doc_id" === 9L).head()
    // corpus bigrams incl. rep doc: (a,b)×3+..., deterministic check:
    // score is finite and negative, ppl > 1
    assert(both.getDouble(2) < 0.0)
    assert(both.getDouble(4) > 1.0)
  }
}
