package graft.queries

import graft.Q
import graft.Q.t
import graft.operators.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-curation operators over the `documents` table: TF-IDF / BM25
  * scoring, deterministic hash splits, stratified sampling, and
  * per-group quota caps — the dataset-construction half of a
  * training-data pipeline, each exact-oracle-checked (the splitmix64
  * mixer is replayed in DuckDB UHUGEINT arithmetic via
  * [[DuckOracle.mix]]).
  */
object CurationQ {

  private val Gamma = "11400714819323198485::UHUGEINT" // 0x9e3779b97f4a7c15

  /** splitmix64-with-gamma bucket replay: Curation.hashBucket in SQL.
    * Low-53-bit extraction is an unsigned modulo by 2^53 (identical to
    * the signed bitwiseAND mask on the Spark side, since the masked
    * value is non-negative in both representations). */
  private def bucketSql(id: String): String =
    s"""CAST(((${DuckOracle.mix(
      s"(CAST($id AS UHUGEINT) + $Gamma) % 18446744073709551616::UHUGEINT")})
        % 9007199254740992::UHUGEINT) % 10000::UHUGEINT AS BIGINT)"""

  /** TF-IDF postings (TextAnalysis.tfIdf): smoothed sklearn idf
    * ln((N+1)/(df+1)) + 1. Counts are integers on both sides; the one
    * float (tf·idf) is rounded at 6 — ln of identical integer ratios
    * differs at worst in the last bit across libms, orders below the
    * grain. Output filtered to tf ≥ 4 to keep the frame presentable. */
  val q53 = Q(
    "q53_tfidf",
    (s, d) => {
      import s.implicits._
      TextAnalysis.tfIdf(t(s, d, "documents"), "doc_id", "text")
        .filter($"tf" >= 4)
        .select($"doc_id", $"term", $"tf", $"doc_freq",
          round($"tfidf", 6).as("tfidf"))
        .orderBy($"doc_id", $"term")
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE length(term) > 0
        GROUP BY doc_id, term
      ), dfreq AS (
        SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
      ), n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
             round(tf.tf * (ln((n.n_docs + 1)::DOUBLE
               / (dfreq.doc_freq + 1)) + 1), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      WHERE tf.tf >= 4
      ORDER BY doc_id, term"""))

  /** Deterministic train/val/test hash split (Curation.hashSplit):
    * bucket = low-53-bits(splitmix64(id + γ)) mod 10000, integer
    * arithmetic end to end — the oracle replays the mixer exactly, so
    * the per-(split, source) counts hash-match. */
  val q54 = Q(
    "q54_hash_split",
    (s, d) => {
      import s.implicits._
      Curation.hashSplit(t(s, d, "documents"), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy($"split", $"source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"split", $"source")
    },
    Some(s"""
      WITH b AS (
        SELECT source, ${bucketSql("doc_id")} AS bucket FROM documents
      )
      SELECT CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val'
                  ELSE 'test' END AS split,
             source, count(*) AS n_docs
      FROM b
      GROUP BY split, source
      ORDER BY split, source"""))

  /** Per-source quota cap (Curation.capPerGroup over the bounded-heap
    * TopKAgg — no per-group window): keep 20 docs per source by the
    * deterministic splitmix priority; the oracle ranks the same signed
    * mix with row_number. Integer keys end to end. */
  val q55 = Q(
    "q55_quota_cap",
    (s, d) => {
      import s.implicits._
      Curation.capPerGroup(t(s, d, "documents"), "source", "doc_id",
          quota = 20, priority = Curation.splitmix($"doc_id"))
        .orderBy($"source", $"rank")
    },
    Some(s"""
      WITH pr AS (
        SELECT source, doc_id,
               ${DuckOracle.toSigned(DuckOracle.mix(
      s"(CAST(doc_id AS UHUGEINT) + $Gamma) % 18446744073709551616::UHUGEINT"))}
                 AS p
        FROM documents
      ), ranked AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY p, doc_id) AS rank
        FROM pr)
      SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 20
      ORDER BY source, rank"""))

  /** BM25 relevance to a data-anchored query term set (TextAnalysis
    * .bm25, k1=1.2, b=0.75): the three most document-frequent tokens
    * (tie → lexicographic), derived identically on both sides, so the
    * fixture survives text-perturbing seed rungs (the r15 seed gate
    * found the old fixed English terms vanish under SeedPerturb's
    * substitution cipher, leaving the query vacuously empty). The
    * 3-row term collect is a query-parameter boundary, not data
    * movement. Postings filtered to the query terms BEFORE any join.
    * avg doc length is the one cross-engine float aggregate; scores
    * are O(1) and rounded at 6. */
  val q56 = Q(
    "q56_bm25",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val terms = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"term").agg(countDistinct($"doc_id").as("df"))
        .orderBy($"df".desc, $"term").limit(3)
        .collect().map(_.getString(0)).toSeq
      TextAnalysis.bm25(docs, "doc_id", "text", terms)
        .select($"doc_id", round($"score", 6).as("score"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
      ), qt AS (
        SELECT term FROM (
          SELECT term, count(DISTINCT doc_id) AS df
          FROM toks WHERE length(term) > 0
          GROUP BY term ORDER BY df DESC, term LIMIT 3)
      ), tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks
        WHERE length(term) > 0 AND term IN (SELECT term FROM qt)
        GROUP BY doc_id, term
      ), dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
      ), stats AS (
        SELECT count(*) AS n_docs,
               avg(len(string_split(text, ' '))) AS avg_dl
        FROM documents
      ), dfreq AS (
        SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
      )
      SELECT tf.doc_id,
             round(sum(
               ln((stats.n_docs - dfreq.doc_freq + 0.5)
                  / (dfreq.doc_freq + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avg_dl))
             ), 6) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
      ORDER BY doc_id"""))

  /** Temperature-weighted mixture sampling (Curation.temperatureSample,
    * α = 0.5): keep rate per source = sqrt(n_min/n_s) — one IEEE sqrt
    * of an exact integer ratio, so the basis-point cut and therefore
    * the whole keep set are integer-exact across engines. The oracle
    * re-derives the census, the rate and the splitmix bucket. */
  val q91 = Q(
    "q91_temperature_mixture",
    (s, d) => {
      import s.implicits._
      Curation.temperatureSample(t(s, d, "documents"),
          "doc_id", "source", alpha = 0.5)
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH c AS (
        SELECT source, count(*) AS n FROM documents GROUP BY 1
      ), mn AS (SELECT min(n) AS nmin FROM c),
      r AS (
        SELECT source,
               CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 10000 + 0.5)
                    AS BIGINT) AS rate_bp
        FROM c CROSS JOIN mn
      ), b AS (
        SELECT doc_id, source, ${bucketSql("doc_id")} AS bucket
        FROM documents
      )
      SELECT b.doc_id, b.source, b.bucket, r.rate_bp,
             b.bucket < r.rate_bp AS keep
      FROM b JOIN r USING (source)
      ORDER BY doc_id"""))

  /** Sliding-window context chunking (Curation.chunkSpans, window 64 /
    * stride 48 → 16-token overlap): integer spans end to end. */
  val q94 = Q(
    "q94_chunk_spans",
    (s, d) => {
      import s.implicits._
      Curation.chunkSpans(t(s, d, "documents"), "doc_id",
          size(split($"text", " ")), window = 64, stride = 48)
        .orderBy($"doc_id", $"chunk_id")
    },
    Some("""
      WITH n AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
                 AS n_tokens
        FROM documents
      ), starts AS (
        SELECT doc_id, n_tokens,
               unnest(range(0,
                 CASE WHEN n_tokens > 64
                      THEN ((n_tokens - 64 + 47) // 48) * 48
                      ELSE 0 END + 1, 48)) AS start_tok
        FROM n WHERE n_tokens > 0
      )
      SELECT doc_id,
             start_tok // 48 AS chunk_id,
             start_tok,
             least(start_tok + 64, n_tokens) AS end_tok,
             least(start_tok + 64, n_tokens) - start_tok AS n_toks
      FROM starts
      ORDER BY doc_id, chunk_id"""))

  /** The full corpus-curation pipeline as ONE query — the chain a
    * training-data team actually runs, integration-gated end to end:
    *   1. quality gate (5 ≤ n_tokens ≤ 10000),
    *   2. exact dedup (poly_hash64 fingerprint, keep smallest id),
    *   3. benchmark decontamination (drop docs sharing any 5-gram with
    *      the doc_id % 97 test split),
    *   4. temperature mixture sampling (α = 0.5 on the SURVIVING
    *      census — the rates reflect what earlier stages kept),
    *   5. GPT-style sequence packing (global prefix-sum offsets).
    * Integers end to end (the one float, the √ sampling rate, is
    * integer-exact per q91). Every stage is one of the registry's
    * already-gated operators — this row gates their COMPOSITION. */
  val q96 = Q(
    "q96_curation_pipeline",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val nTok = size(graft.operators.TextAnalysis.tokens($"text"))
      val s1 = docs.filter(nTok.between(5, 10000))
      val keepers = s1
        .groupBy(graft.functions.Expressions.polyHash64($"text").as("fp"))
        .agg(min($"doc_id").as("doc_id"))
      val s2 = s1.join(keepers.select($"doc_id"), Seq("doc_id"))
      val test = docs.filter($"doc_id" % 97 === 0)
      val corpus2 = s2.filter($"doc_id" % 97 =!= 0)
      val cleanIds = graft.operators.Dedup
        .decontaminate(corpus2, test, "doc_id", "text", k = 5)
        .filter(!$"contaminated").select($"doc_id")
      val s3 = corpus2.join(cleanIds, Seq("doc_id"))
      val sampledIds = Curation
        .temperatureSample(s3, "doc_id", "source", alpha = 0.5)
        .filter($"keep").select($"doc_id")
      val s4 = s3.join(sampledIds, Seq("doc_id"))
      Curation.packSequences(s4, "doc_id",
          size(graft.operators.TextAnalysis.tokens($"text")), 512)
        .select($"doc_id", $"source", $"n_tokens", $"token_offset",
          $"chunk_start", $"chunk_end")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH n0 AS (
        SELECT doc_id, source, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
      ), s1 AS (
        SELECT * FROM n0 WHERE n_tokens BETWEEN 5 AND 10000
      ), fp AS (
        SELECT doc_id, ${DuckOracle.phS("text")} AS fp FROM s1
      ), keepers AS (
        SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp
      ), s2 AS (
        SELECT s1.* FROM s1 JOIN keepers USING (doc_id)
      ), test_sh AS (
        SELECT DISTINCT gram FROM (
          SELECT unnest(list_transform(
            range(1, len(string_split(text, ' ')) - 3),
            i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))
            AS gram
          FROM documents WHERE doc_id % 97 = 0) u
      ), corpus2 AS (
        SELECT * FROM s2 WHERE doc_id % 97 <> 0
      ), contaminated AS (
        SELECT DISTINCT c.doc_id FROM (
          SELECT doc_id, unnest(list_transform(
            range(1, len(string_split(text, ' ')) - 3),
            i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))
            AS gram
          FROM corpus2) c
        JOIN test_sh t USING (gram)
      ), s3 AS (
        SELECT corpus2.* FROM corpus2
        ANTI JOIN contaminated USING (doc_id)
      ), c AS (
        SELECT source, count(*) AS n FROM s3 GROUP BY 1
      ), mn AS (SELECT min(n) AS nmin FROM c),
      r AS (
        SELECT source,
               CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 10000 + 0.5)
                    AS BIGINT) AS rate_bp
        FROM c CROSS JOIN mn
      ), s4 AS (
        SELECT s3.* FROM s3 JOIN r USING (source)
        WHERE ${bucketSql("doc_id")} < r.rate_bp
      ), o AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS token_offset
        FROM s4
      )
      SELECT doc_id, source, n_tokens, token_offset,
             token_offset // 512 AS chunk_start,
             (token_offset + n_tokens - 1) // 512 AS chunk_end
      FROM o
      ORDER BY doc_id"""))

  /** Weighted sampling without replacement (Curation.weightedSample,
    * A-ES keys ln(u)/w with w = n_chars, top 50): the uniform u is
    * integer-exact on both engines (53-bit splitmix + 0.5 over 2^53);
    * ln and the division differ at worst in the last bit — selection
    * flips would need two keys within ulps, absent by construction. */
  val q98 = Q(
    "q98_weighted_sample",
    (s, d) => {
      import s.implicits._
      Curation.weightedSample(t(s, d, "documents"), "doc_id",
          $"n_chars", k = 50)
        .select($"doc_id", DomainQ.emit6($"es_key").as("es_key"),
          $"rank")
        .orderBy($"rank")
    },
    Some(s"""
      WITH u AS (
        SELECT doc_id, n_chars,
               (CAST(${DuckOracle.mix(
      s"(CAST(doc_id AS UHUGEINT) + $Gamma) % 18446744073709551616::UHUGEINT")}
                  % 9007199254740992::UHUGEINT AS DOUBLE) + 0.5)
                 / 9007199254740992 AS u
        FROM documents
      ), keyed AS (
        SELECT doc_id, ln(u) / n_chars AS key FROM u
      ), ranked AS (
        SELECT doc_id, key,
               row_number() OVER (ORDER BY key DESC, doc_id) AS rank
        FROM keyed
      )
      SELECT doc_id, round(key, 6) + 0.0 AS es_key,
             CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 50
      ORDER BY rank"""))

  /** Quality-classifier training end-to-end (ml.Logistic): an IRLS
    * logistic fit of a deterministic pseudo-label against two
    * text-shape features (scaled word count; long-word fraction), the
    * supervised-scoring step of fasttext-style curation pipelines. The
    * query surface is the whole 6-iteration Newton trajectory; the
    * oracle replays every iteration as a recursive CTE — per-row
    * sigmoid against the carried coefficients, the 9 gradient/Hessian
    * sums, and the SAME Cramer term grouping the Scala solver uses
    * (transcribed verbatim from ml.Logistic), so the gate covers the
    * full feedback loop, not just the last iterate. */
  val q106 = Q(
    "q106_quality_classifier",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter($"text".isNotNull)
      val nWords = size(split($"text", " "))
      val f1 = nWords.cast("double") / lit(10.0)
      val f2 = size(filter(split($"text", " "), w => length(w) > 4))
        .cast("double") / greatest(nWords, lit(1)).cast("double")
      val y = when(($"doc_id" * 1000003L) % 100 <
          lit(30) + lit(40) * when(nWords >= 12, 1).otherwise(0),
          1.0).otherwise(0.0)
      val feats = docs.select(f1.as("f1"), f2.as("f2"), y.as("y"))
      val traj = graft.ml.Logistic.irlsFit2(
        feats, $"f1", $"f2", $"y", iters = 6)
      traj.toDF("iter", "b0", "b1", "b2")
        .select($"iter".cast("long").as("iter"),
          DomainQ.emit6($"b0").as("b0"),
          DomainQ.emit6($"b1").as("b1"),
          DomainQ.emit6($"b2").as("b2"))
        .orderBy($"iter")
    },
    Some("""
      WITH RECURSIVE d AS (
        SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) / 10.0 AS f1,
               CAST(len(list_filter(string_split(text, ' '),
                 w -> length(w) > 4)) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1) AS f2,
               CASE WHEN (doc_id * 1000003) % 100 <
                 30 + 40 * (CASE WHEN len(string_split(text, ' ')) >= 12
                            THEN 1 ELSE 0 END)
                 THEN 1.0 ELSE 0.0 END AS y
        FROM documents WHERE text IS NOT NULL
      ), it AS (
        -- seed MUST be typed DOUBLE: a bare 0.0 is DECIMAL(2,1) and the
        -- UNION ALL would coerce every carried iterate to one decimal
        SELECT 0 AS iter, CAST(0.0 AS DOUBLE) AS b0,
               CAST(0.0 AS DOUBLE) AS b1, CAST(0.0 AS DOUBLE) AS b2
        UNION ALL
        SELECT x.iter + 1,
          x.b0 + (x.g0 * (x.h11 * x.h22 - x.h12 * x.h12)
                - x.h01 * (x.g1 * x.h22 - x.h12 * x.g2)
                + x.h02 * (x.g1 * x.h12 - x.h11 * x.g2))
               / (x.h00 * (x.h11 * x.h22 - x.h12 * x.h12)
                - x.h01 * (x.h01 * x.h22 - x.h12 * x.h02)
                + x.h02 * (x.h01 * x.h12 - x.h11 * x.h02)),
          x.b1 + (x.h00 * (x.g1 * x.h22 - x.h12 * x.g2)
                - x.g0 * (x.h01 * x.h22 - x.h12 * x.h02)
                + x.h02 * (x.h01 * x.g2 - x.g1 * x.h02))
               / (x.h00 * (x.h11 * x.h22 - x.h12 * x.h12)
                - x.h01 * (x.h01 * x.h22 - x.h12 * x.h02)
                + x.h02 * (x.h01 * x.h12 - x.h11 * x.h02)),
          x.b2 + (x.h00 * (x.h11 * x.g2 - x.g1 * x.h12)
                - x.h01 * (x.h01 * x.g2 - x.g1 * x.h02)
                + x.g0 * (x.h01 * x.h12 - x.h11 * x.h02))
               / (x.h00 * (x.h11 * x.h22 - x.h12 * x.h12)
                - x.h01 * (x.h01 * x.h22 - x.h12 * x.h02)
                + x.h02 * (x.h01 * x.h12 - x.h11 * x.h02))
        FROM (
          SELECT r.iter, r.b0, r.b1, r.b2,
                 sum(r.y - r.p) AS g0,
                 sum((r.y - r.p) * r.f1) AS g1,
                 sum((r.y - r.p) * r.f2) AS g2,
                 sum(r.p * (1.0 - r.p)) AS h00,
                 sum(r.p * (1.0 - r.p) * r.f1) AS h01,
                 sum(r.p * (1.0 - r.p) * r.f2) AS h02,
                 sum(r.p * (1.0 - r.p) * r.f1 * r.f1) AS h11,
                 sum(r.p * (1.0 - r.p) * r.f1 * r.f2) AS h12,
                 sum(r.p * (1.0 - r.p) * r.f2 * r.f2) AS h22
          FROM (
            SELECT s.iter, s.b0, s.b1, s.b2, dd.f1, dd.f2, dd.y,
                   1.0 / (1.0 + exp(-(s.b0 + s.b1 * dd.f1
                     + s.b2 * dd.f2))) AS p
            FROM it s, d dd
            WHERE s.iter < 6
          ) r
          GROUP BY r.iter, r.b0, r.b1, r.b2
        ) x
      )
      SELECT CAST(iter AS BIGINT) AS iter,
             round(b0, 6) + 0.0 AS b0,
             round(b1, 6) + 0.0 AS b1,
             round(b2, 6) + 0.0 AS b2
      FROM it WHERE iter >= 1
      ORDER BY iter"""))

  /** URL-canonicalization dedup (operators.Web): the corpus's crawl
    * URLs are synthesized deterministically from (source, doc_id) in
    * four raw spellings — host/scheme case + explicit default port,
    * duplicate-slash path + fragment + tracking param, and
    * shuffled-query variants — that all canonicalize to the same page
    * URL. The query is the dedup census over the canonical key; the
    * oracle replays the full RFC-3986-style normalization chain
    * (Web.canonicalizeUrlSql) on the identical raw strings, so every
    * rule — port strip, www strip, slash collapse, trailing slash,
    * fragment drop, tracking-param filter, param sort — is hash-gated. */
  val q107 = Q(
    "q107_url_dedup",
    (s, d) => {
      import s.implicits._
      val k = ($"doc_id" % 7).cast("string")
      val v = $"doc_id" % 4
      val raw = when(v === 0, concat(lit("https://www."), $"source",
          lit(".example.com/p/"), k, lit("?a=1&b=2")))
        .when(v === 1, concat(lit("HTTPS://WWW."), upper($"source"),
          lit(".EXAMPLE.COM:443/p/"), k, lit("?b=2&a=1")))
        .when(v === 2, concat(lit("https://"), $"source",
          lit(".example.com/p//"), k, lit("/?a=1&utm_source=x&b=2#sec")))
        .otherwise(concat(lit("https://www."), $"source",
          lit(".example.com:443/p/"), k, lit("?utm_campaign=z&ref=h&a=1&b=2")))
      val docs = t(s, d, "documents").select($"doc_id", raw.as("url"))
      graft.operators.Web.urlDedup(docs, "url", "doc_id")
        .select($"canonical_url", $"n_dups", $"keep_id")
        .orderBy($"canonical_url")
    },
    Some(s"""
      WITH raw AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'https://www.' || source || '.example.com/p/'
                   || CAST(doc_id % 7 AS VARCHAR) || '?a=1&b=2'
                 WHEN 1 THEN 'HTTPS://WWW.' || upper(source)
                   || '.EXAMPLE.COM:443/p/' || CAST(doc_id % 7 AS VARCHAR)
                   || '?b=2&a=1'
                 WHEN 2 THEN 'https://' || source || '.example.com/p//'
                   || CAST(doc_id % 7 AS VARCHAR)
                   || '/?a=1&utm_source=x&b=2#sec'
                 ELSE 'https://www.' || source || '.example.com:443/p/'
                   || CAST(doc_id % 7 AS VARCHAR)
                   || '?utm_campaign=z&ref=h&a=1&b=2'
               END AS url
        FROM documents
      ), canon AS (
        SELECT doc_id,
               ${graft.operators.Web.canonicalizeUrlSql("url")}
                 AS canonical_url
        FROM raw
      )
      SELECT canonical_url, count(*) AS n_dups, min(doc_id) AS keep_id
      FROM canon
      GROUP BY canonical_url
      ORDER BY canonical_url"""))

  /** The DuckDB spelling of the Morton interleave (HashFuncs.zorder2):
    * an explicit OR of the 2·bits shifted bit extractions. */
  private def zorderSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** Z-order layout key (functions.Expressions.zorder2, the clustering
    * key behind Store.saveZOrdered): Morton-interleave two bounded
    * dimensions of the events table and aggregate per coarse z-bucket.
    * The min/max spans per bucket ARE the zone-map story — the oracle
    * gating them exactly shows every bucket bounds BOTH dimensions at
    * once, which is why a Z-ordered rewrite makes parquet row-group
    * min/max pruning selective for predicates on either column. The
    * kernel is a codegen shift/mask loop; the oracle replays all 20 bit
    * extractions as explicit arithmetic. */
  val q108 = Q(
    "q108_zorder_layout",
    (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select(($"user_id" % 1024).as("a"), ($"event_id" % 1024).as("b"))
      ev.select($"a", $"b",
          graft.functions.Expressions.zorder2($"a", $"b", 10).as("zkey"))
        .groupBy(shiftrightunsigned($"zkey", 10).as("zbucket"))
        .agg(count(lit(1)).as("n_events"),
          min($"a").as("min_a"), max($"a").as("max_a"),
          min($"b").as("min_b"), max($"b").as("max_b"))
        .orderBy($"zbucket")
    },
    Some(s"""
      WITH dims AS (
        SELECT CAST(user_id % 1024 AS BIGINT) AS a,
               CAST(event_id % 1024 AS BIGINT) AS b
        FROM events
      ), keyed AS (
        SELECT a, b, ${zorderSql("a", "b", 10)} AS zkey FROM dims
      )
      SELECT zkey >> 10 AS zbucket, count(*) AS n_events,
             min(a) AS min_a, max(a) AS max_a,
             min(b) AS min_b, max(b) AS max_b
      FROM keyed
      GROUP BY zbucket
      ORDER BY zbucket"""))

  /** MERGE INTO / upsert (Store.mergeUpsert): a deterministic change
    * batch — revisions (doc_id%9, unless deleted), deletions (doc_id%31),
    * inserts (doc_id%13 shifted) — merged into the corpus snapshot with
    * ONE full-outer key join. Whole-row replacement semantics are part
    * of the gate: an update row REPLACES the base row even where its
    * payload is null. */
  val q118 = Q(
    "q118_merge_upsert",
    (s, d) => {
      import s.implicits._
      val base = t(s, d, "documents")
        .select($"doc_id", $"text", $"lang", $"source")
      val upd = base.filter($"doc_id" % 31 === 0 || $"doc_id" % 9 === 0)
        .select($"doc_id",
          when($"doc_id" % 31 === 0, $"text")
            .otherwise(concat($"text", lit(" [v2]"))).as("text"),
          $"lang", $"source", ($"doc_id" % 31 === 0).as("is_delete"))
        .unionByName(base.filter($"doc_id" % 13 === 0)
          // inserted ids live in a disjoint high-bit namespace
          // (1 << 41): a fixed decimal offset collides with real
          // doc_ids at replica scales, turning planted inserts into
          // accidental updates
          .select(($"doc_id" + (1L << 41)).as("doc_id"), $"text", $"lang",
            $"source", lit(false).as("is_delete")))
      graft.io.Store.mergeUpsert(base, upd, "doc_id")
        .select($"doc_id", $"text", $"lang", $"source")
        .orderBy($"doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, text, lang, source FROM documents
      ), u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 31 = 0 THEN text
                    ELSE text || ' [v2]' END AS text,
               lang, source, doc_id % 31 = 0 AS is_delete
        FROM documents WHERE doc_id % 31 = 0 OR doc_id % 9 = 0
        UNION ALL
        SELECT doc_id + 2199023255552, text, lang, source, false
        FROM documents WHERE doc_id % 13 = 0
      )
      SELECT coalesce(b.doc_id, u.doc_id) AS doc_id,
             CASE WHEN u.doc_id IS NOT NULL THEN u.text ELSE b.text END
               AS text,
             CASE WHEN u.doc_id IS NOT NULL THEN u.lang ELSE b.lang END
               AS lang,
             CASE WHEN u.doc_id IS NOT NULL THEN u.source ELSE b.source
               END AS source
      FROM b FULL OUTER JOIN u ON b.doc_id = u.doc_id
      WHERE u.is_delete IS NULL OR NOT u.is_delete
      ORDER BY doc_id"""))

  /** Incremental statistics maintenance: the corpus arrives as two
    * shards (old/new by doc_id parity); each shard reduces to mergeable
    * per-source state (n, Σchars, Σchars², Σtokens) INDEPENDENTLY, the
    * states merge by addition, and the merged state derives mean and
    * sample variance — never rescanning the first shard. The gate: the
    * oracle computes the same statistics DIRECTLY over the whole corpus,
    * so state mergeability is proven exactly (integer sums; the only
    * floats are the final two divisions, identical arithmetic both
    * sides). This is the contract that lets 100 TB stats update from a
    * 1 GB delta. */
  val q125 = Q(
    "q125_incremental_stats",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter($"text".isNotNull)
        .select($"source", length($"text").cast("long").as("c"),
          size(split($"text", " ")).cast("long").as("tk"),
          ($"doc_id" % 2).as("shard"))
      def state(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"source").agg(count(lit(1)).as("n"),
          sum($"c").as("s1"), sum($"c" * $"c").as("s2"),
          sum($"tk").as("st"))
      val merged = state(docs.filter($"shard" === 0))
        .unionByName(state(docs.filter($"shard" === 1)))
        .groupBy($"source")
        .agg(sum($"n").as("n"), sum($"s1").as("s1"),
          sum($"s2").as("s2"), sum($"st").as("st"))
      merged.select($"source", $"n", $"st".as("total_tokens"),
          round($"s1".cast("double") / $"n".cast("double"), 6)
            .as("mean_chars"),
          round(($"s2".cast("double") - $"s1".cast("double")
              * $"s1".cast("double") / $"n".cast("double"))
            / ($"n" - 1).cast("double"), 6).as("var_chars"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, count(*) AS n,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS total_tokens,
             round(CAST(sum(length(text)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS mean_chars,
             round((CAST(sum(length(text) * length(text)) AS DOUBLE)
                    - CAST(sum(length(text)) AS DOUBLE)
                      * CAST(sum(length(text)) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE))
                   / CAST(count(*) - 1 AS DOUBLE), 6) AS var_chars
      FROM documents WHERE text IS NOT NULL
      GROUP BY source
      ORDER BY source"""))

  /** Length-bucketed batching efficiency: docs grouped into
    * power-of-two token-length buckets (the dynamic-batching scheme
    * inference servers use), with the padding waste each bucket pays
    * when every sequence pads to the bucket size. All integers —
    * bucket = 2^ceil(log2(tokens)) computed by bit arithmetic, not
    * floating log. */
  val q128 = Q(
    "q128_length_buckets",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter($"text".isNotNull)
        .select(size(split($"text", " ")).cast("long").as("tk"))
        .filter($"tk" >= 1)
      // smallest 2^k >= tk as an integer comparison chain — floating
      // log2 would sit exactly on a boundary at every power of two
      val bucket = (0 to 20).map(k => 1L << k)
        .foldRight(lit(1L << 21): org.apache.spark.sql.Column) {
          (p, acc) => when($"tk" <= p, lit(p)).otherwise(acc)
        }
      docs.withColumn("bucket", bucket)
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"tk").as("total_tokens"),
          (count(lit(1)) * first($"bucket")).as("capacity"))
        .select($"bucket", $"n_docs", $"total_tokens",
          ($"capacity" - $"total_tokens").as("padding_waste"))
        .orderBy($"bucket")
    },
    Some {
      val chain = (0 to 20).map(k => 1L << k)
        .map(p => s"WHEN tk <= $p THEN CAST($p AS BIGINT)")
        .mkString("CASE ", " ", s" ELSE CAST(${1L << 21} AS BIGINT) END")
      s"""
      WITH tk AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        FROM documents WHERE text IS NOT NULL
          AND len(string_split(text, ' ')) >= 1
      ), b AS (
        SELECT tk, $chain AS bucket FROM tk
      )
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(tk) AS BIGINT) AS total_tokens,
             CAST(count(*) * bucket - sum(tk) AS BIGINT) AS padding_waste
      FROM b GROUP BY bucket
      ORDER BY bucket"""
    })

  /** Snapshot distribution drift: source-mix shift between two corpus
    * snapshots (old = even doc_id, new = odd — the deterministic stand-in
    * for "last month's crawl vs this month's"), reported as per-source
    * shares plus each source's KL-divergence contribution
    * p_new·ln(p_new/p_old). The drift monitor every recurring ingest
    * pipeline runs before a training mix is rebuilt. ONE conditional-agg
    * pass over the corpus; the per-source count frame is KB-scale and
    * the two totals broadcast back. Counts are exact integers; the only
    * floats are two divisions and one ln per source row. */
  val q132 = Q(
    "q132_source_drift",
    (s, d) => {
      import s.implicits._
      val counts = t(s, d, "documents")
        .groupBy($"source")
        .agg(sum(when($"doc_id" % 2 === 0, 1L).otherwise(0L)).as("n_old"),
          sum(when($"doc_id" % 2 === 1, 1L).otherwise(0L)).as("n_new"))
      val tot = counts.agg(sum($"n_old").as("tot_old"),
        sum($"n_new").as("tot_new"))
      counts.crossJoin(broadcast(tot))
        .select($"source", $"n_old", $"n_new",
          round($"n_old" / $"tot_old", 6).as("p_old"),
          round($"n_new" / $"tot_new", 6).as("p_new"),
          when($"n_old" > 0 && $"n_new" > 0,
            round(($"n_new" / $"tot_new") *
              log(($"n_new" * $"tot_old") / ($"n_old" * $"tot_new")), 6))
            .otherwise(lit(null)).as("kl_term"))
        .orderBy($"source")
    },
    Some("""
      WITH c AS (
        SELECT source,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_old,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_new
        FROM documents GROUP BY source
      ), tt AS (
        SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
               CAST(sum(n_new) AS BIGINT) AS tot_new FROM c
      )
      SELECT source, n_old, n_new,
             round(n_old / tot_old, 6) AS p_old,
             round(n_new / tot_new, 6) AS p_new,
             CASE WHEN n_old > 0 AND n_new > 0 THEN
               round((n_new / tot_new)
                 * ln((n_new * tot_old) / (n_old * tot_new)), 6)
             ELSE NULL END AS kl_term
      FROM c, tt
      ORDER BY source"""))

  /** Heuristic-score calibration curve: the stopword-hit quality score
    * (q30's signal) bucketed into deciles, with the observed fraction
    * of actually-English docs per bucket — the reliability diagram that
    * tells you whether a cheap filter's score is trustworthy before
    * gating a 100 TB corpus on it. Bucket = (hits·10) div tokens is
    * INTEGER arithmetic (a floating decile would sit on boundaries);
    * one grouped conditional-agg pass. */
  val q133 = Q(
    "q133_score_calibration",
    (s, d) => {
      import s.implicits._
      val toks = TextAnalysis.tokens($"text")
      t(s, d, "documents").filter($"text".isNotNull)
        .select($"lang",
          TextAnalysis.hitCount(toks, TextAnalysis.stopwords("en"))
            .cast("long").as("hits"),
          size(split($"text", " ")).cast("long").as("tk"))
        .filter($"tk" >= 1)
        .withColumn("bucket",
          expr("least((hits * 10) div tk, cast(9 as bigint))"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("n_en"))
        .select($"bucket", $"n_docs", $"n_en",
          round($"n_en" / $"n_docs", 6).as("frac_en"))
        .orderBy($"bucket")
    },
    Some {
      def inList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")
      s"""
      WITH f AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN (${inList(TextAnalysis.stopwords("en"))})))
                 AS BIGINT) AS hits,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        FROM documents WHERE text IS NOT NULL
      ), b AS (
        SELECT lang, least((hits * 10) // tk, 9) AS bucket
        FROM f WHERE tk >= 1
      )
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_en,
             round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) / count(*), 6) AS frac_en
      FROM b GROUP BY bucket ORDER BY bucket"""
    })

  /** Link-graph PageRank (Graph.pageRank) — the crawl-curation source-
    * quality prior, Common-Crawl-host-ranking style. The synthetic link
    * graph is deterministic modular arithmetic over the contiguous
    * doc_id space (3 out-edges per doc: dst = (id·48271 + 7919·j + 1)
    * mod n, minstd-scattered), so both engines build the identical
    * graph; ranks are scaled-BIGINT integer arithmetic end to end
    * (every division a floor div), so eight damped power iterations are
    * bit-identical regardless of reduction order — no float drift to
    * round away. The oracle unrolls the recurrence as eight CTE stages.
    * Scale: one contribution shuffle + one node-set left join per
    * iteration, lineage truncated every 4 rounds. */
  val q135 = Q(
    "q135_pagerank", {
      (s, d) => {
        import s.implicits._
        val nodes = t(s, d, "documents").select($"doc_id".as("id"))
        val nDf = nodes.agg(count(lit(1)).as("n"))
        val edges = nodes.crossJoin(broadcast(nDf))
          .select($"id".as("src"), explode(array((0 until 3).map(j =>
            pmod($"id" * 48271L + lit(7919L * j + 1), $"n")): _*))
            .as("dst"))
        graft.operators.Graph.pageRank(nodes, edges, iters = 8)
          .select($"id".as("doc_id"), $"rank".as("pr"))
          .orderBy($"doc_id")
      }
    }, {
      val base = "(15 * (1000000000000 // cnt.n)) // 100"
      val iter = (prev: String, cur: String) => s"""
      $cur AS (
        SELECT nodes.id,
               $base + (85 * COALESCE(c.s, 0)) // 100 AS r
        FROM nodes CROSS JOIN cnt
        LEFT JOIN (SELECT e.dst AS id, sum($prev.r // e.deg) AS s
                   FROM e JOIN $prev ON e.src = $prev.id
                   GROUP BY e.dst) c
          ON nodes.id = c.id)"""
      val rounds = (1 to 8).map(i => iter(s"r${i - 1}", s"r$i"))
        .mkString(",")
      Some(s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      cnt AS (SELECT count(*) AS n FROM nodes),
      edges AS (
        SELECT id AS src, (id * 48271 + 7919 * j + 1) % cnt.n AS dst
        FROM nodes CROSS JOIN cnt
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
      ), deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      e AS (SELECT edges.src, edges.dst, deg.deg
            FROM edges JOIN deg USING (src)),
      r0 AS (SELECT id, 1000000000000 // cnt.n AS r
             FROM nodes CROSS JOIN cnt),$rounds
      SELECT id AS doc_id, CAST(r AS BIGINT) AS pr
      FROM r8 ORDER BY doc_id""")
    })

  /** Rendezvous-sharding reshard report ([[graft.operators.Sharding]]):
    * HRW assignment under 8 and 9 shards, movement census per old
    * shard. The Spark side is ONE row-local sequence→transform→
    * array_sort expression (no shuffle until the census groupBy); the
    * oracle replays the same splitmix weight chain through a 9-way
    * unnest + arg_max. Only docs whose new argmax IS the new shard may
    * move, so moved_frac per shard concentrates near 1/9 — the
    * minimal-movement property that makes topology changes affordable
    * at 100 TB. */
  val q141 = Q(
    "q141_rendezvous_reshard",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").select($"doc_id")
      graft.operators.Sharding.reshardReport(docs, "doc_id", 8)
        .groupBy($"shard_old")
        .agg(count(lit(1)).as("n_docs"), sum($"moved").as("n_moved"))
        .select($"shard_old", $"n_docs",
          $"n_moved",
          (round($"n_moved".cast("double") / $"n_docs".cast("double"), 6)
            + lit(0.0)).as("moved_frac"))
        .orderBy($"shard_old")
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               ${DuckOracle.mix(
                 s"(CAST(doc_id AS UHUGEINT) + $Gamma)"
                 + " % 18446744073709551616::UHUGEINT")} AS base
        FROM documents
      ), cand AS (
        SELECT doc_id, CAST(s AS BIGINT) AS s,
               CAST(${DuckOracle.mix(
                 s"(base + (CAST(s AS UHUGEINT) + 1) * $Gamma)"
                 + " % 18446744073709551616::UHUGEINT")}
                 % 9007199254740992::UHUGEINT AS BIGINT) AS w
        FROM b, range(0, 9) t(s)
      ), pick AS (
        SELECT doc_id,
               arg_max(s, w) FILTER (WHERE s < 8) AS sh8,
               arg_max(s, w) AS sh9
        FROM cand GROUP BY doc_id
      )
      SELECT CAST(sh8 AS BIGINT) AS shard_old,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved,
             round(CAST(sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) + 0.0
               AS moved_frac
      FROM pick
      GROUP BY sh8
      ORDER BY shard_old"""))

  /** Mergeable log-linear quantile sketch (QuantileHist — the
    * HdrHistogram/DDSketch bucketing with integer-exact arithmetic):
    * per-(source, lang) doc-length histograms MERGED to per-source
    * (counts sum by bucket — the rollup never re-touches raw docs),
    * then P50/P90/P99 estimated from the ≤2k-row sketch, with the
    * exact percentile computed beside it for calibration. At 100 TB
    * the sketch path answers tail-latency-style length questions from
    * kilobyte state per slice; rel. error is ≤ 2^-5 by construction
    * and the exact column shows it. */
  val q143 = Q(
    "q143_quantile_sketch",
    (s, d) => {
      import s.implicits._
      import graft.operators.QuantileHist
      val docs = t(s, d, "documents").select($"source", $"lang", $"n_chars")
      val hist = QuantileHist.histogram(docs, Seq("source", "lang"), "n_chars")
      val merged = QuantileHist.merge(hist, Seq("source"))
      val est = QuantileHist.quantiles(merged, Seq("source"), Seq(50, 90, 99))
      // exact lower-interpolation percentile, same integer rank rule
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"n_chars")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val census = docs.groupBy($"source", $"n_chars")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(w))
        .withColumn("nn", sum($"cnt").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      val rank = call_function("div", $"p" * $"nn" + 99L, lit(100L))
      val exact = census
        .select(col("*"),
          explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
        .filter($"cum" - $"cnt" < rank && $"cum" >= rank)
        .select($"source", $"p", $"n_chars".as("exact"))
      est.join(exact, Seq("source", "p"))
        .select($"source", $"n", $"p", $"est", $"exact")
        .orderBy($"source", $"p")
    },
    Some(s"""
      WITH h AS (
        SELECT source, lang,
               ${graft.operators.QuantileHist.bucketIdxSql("n_chars")}
                 AS bucket,
               count(*) AS cnt
        FROM documents GROUP BY 1, 2, 3
      ), m AS (
        SELECT source, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
        FROM h GROUP BY 1, 2
      ), c AS (
        SELECT source, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY source ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM m
      ), est AS (
        SELECT source, n, p.p AS p,
               ${graft.operators.QuantileHist.bucketMidSql("bucket")}
                 AS est
        FROM c, (VALUES (50), (90), (99)) p(p)
        WHERE cum - cnt < (p.p * n + 99) // 100
          AND cum >= (p.p * n + 99) // 100
      ), ec AS (
        SELECT source, n_chars, cnt,
               CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS nn
        FROM (SELECT source, n_chars, count(*) AS cnt
              FROM documents GROUP BY 1, 2)
      ), ex AS (
        SELECT source, p.p AS p, n_chars AS exact
        FROM ec, (VALUES (50), (90), (99)) p(p)
        WHERE cum - cnt < (p.p * nn + 99) // 100
          AND cum >= (p.p * nn + 99) // 100
      )
      SELECT est.source, est.n, CAST(est.p AS BIGINT) AS p,
             CAST(est.est AS BIGINT) AS est, ex.exact
      FROM est JOIN ex ON est.source = ex.source AND est.p = ex.p
      ORDER BY est.source, est.p"""))

  /** DSIR importance weights (Curation.dsirLogRatios — Xie et al. 2023):
    * target slice = English docs; every doc scored by its hashed-bigram
    * log-likelihood ratio against (target LM − raw-pool LM), selected =
    * ratio > 0. The model is ONE 2048-row bucket table (hashed feature
    * space) broadcast to the scoring pass; the oracle retrains the
    * identical smoothed models in SQL — counts and bucket hashing are
    * integer-exact, ln summation order is absorbed by emit6 rounding,
    * and the selection flag compares the ROUNDED value so both engines
    * threshold the same number. */
  val q145 = Q(
    "q145_dsir_selection",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val scored = Curation.dsirLogRatios(
        docs.withColumn("is_en", $"lang" === "en"), "doc_id", "is_en")
      val lr6 = DomainQ.emit6(coalesce($"log_ratio", lit(0.0)))
      docs.select($"doc_id", $"lang")
        .join(scored, Seq("doc_id"), "left")
        .select($"doc_id", $"lang",
          coalesce($"n_grams", lit(0L)).as("n_grams"),
          lr6.as("log_ratio"),
          (lr6 > 0.0).as("selected"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH tk AS (
        SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
      ), bg AS (
        SELECT doc_id, (lang = 'en') AS is_t,
               CAST(${DuckOracle.phU(
                 "array_to_string(list_slice(l, i, i + 1), ' ')")}
                 % 2048::UHUGEINT AS BIGINT) AS bkt
        FROM (SELECT doc_id, lang, l, unnest(range(1, len(l))) AS i
              FROM tk WHERE len(l) >= 2)
      ), counts AS (
        SELECT bkt,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
               count(*) AS cr
        FROM bg GROUP BY 1
      ), totals AS (
        SELECT sum(ct) AS nt, sum(cr) AS nr FROM counts
      ), model AS (
        SELECT bkt, ln((ct + 1.0) / (nt + 2048.0))
                  - ln((cr + 1.0) / (nr + 2048.0)) AS lr
        FROM counts, totals
      ), scored AS (
        SELECT doc_id, count(*) AS n_grams, sum(lr) AS lp
        FROM bg JOIN model USING (bkt) GROUP BY 1
      )
      SELECT d.doc_id, d.lang,
             coalesce(s.n_grams, 0) AS n_grams,
             round(coalesce(s.lp, 0.0), 6) + 0.0 AS log_ratio,
             round(coalesce(s.lp, 0.0), 6) + 0.0 > 0.0 AS selected
      FROM documents d LEFT JOIN scored s USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Leakage-safe split (Curation.leakageSafeSplit): near-dup clusters
    * (q62's Jaccard-0.12 components) inherit ONE split from the
    * splitmix bucket of their component id, so no near-dup pair ever
    * straddles train/val/test. The oracle replays the q62 transitive
    * closure (recursive CTE — fine at oracle scale; the Spark side is
    * the O(log diameter) label-propagation plan) and the same UHUGEINT
    * bucket arithmetic on the component id. Everything integer/string —
    * no float boundary. */
  val q148 = Q(
    "q148_leakage_safe_split",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.12)
      Curation.leakageSafeSplit(docs, pairs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select($"doc_id", $"component", $"split")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
                   AS shingle
          FROM documents)
      ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ), pairs AS (
        SELECT id_a, id_b
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.12
      ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
      ), reach AS (
        SELECT u AS src, u AS dst FROM edges
        UNION
        SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON e.u = r.dst
      ), comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
      ), docs2 AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      ), b AS (
        SELECT doc_id, component,
               ${bucketSql("component")} AS bucket
        FROM docs2)
      SELECT doc_id, component,
             CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id"""))

  /** Exact ROC-AUC of the q106 feature `f2` (fraction of long words)
    * against the q106 synthetic label — [[graft.ml.Eval.exactAuc]]:
    * Mann-Whitney rank-sum with midrank ties, all-BIGINT until the one
    * final division. The oracle replays the identity with a window over
    * the distinct-score census (fine at oracle scale; the Spark side is
    * the partition-offset prefix sum that never sees a corpus-wide
    * window). Scores are int/int doubles, so the census keys agree
    * bit-for-bit across engines. */
  val q149 = Q(
    "q149_exact_auc",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter($"text".isNotNull)
      val nWords = size(split($"text", " "))
      val score = size(filter(split($"text", " "), w => length(w) > 4))
        .cast("double") / greatest(nWords, lit(1)).cast("double")
      val y = when(($"doc_id" * 1000003L) % 100 <
          lit(30) + lit(40) * when(nWords >= 12, 1).otherwise(0), 1L)
        .otherwise(0L)
      graft.ml.Eval.exactAuc(docs.select(score.as("s"), y.as("y")),
          $"s", $"y")
        .select($"n_pos", $"n_neg", $"u_times2",
          DomainQ.emit6($"auc").as("auc"))
    },
    Some("""
      WITH d AS (
        SELECT CAST(len(list_filter(string_split(text, ' '),
                 w -> length(w) > 4)) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS s,
               CASE WHEN (doc_id * 1000003) % 100 <
                 30 + 40 * (CASE WHEN len(string_split(text, ' ')) >= 12
                            THEN 1 ELSE 0 END)
                 THEN 1 ELSE 0 END AS y
        FROM documents WHERE text IS NOT NULL
      ), g AS (
        SELECT s, count(*) AS n, sum(y) AS np FROM d GROUP BY s
      ), c AS (
        SELECT n, np,
               coalesce(sum(n) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum
        FROM g
      ), t AS (
        SELECT CAST(sum(np) AS BIGINT) AS np,
               CAST(sum(n) - sum(np) AS BIGINT) AS nn,
               CAST(sum(np * (2 * cum + n + 1)) AS BIGINT) AS r2
        FROM c)
      SELECT np AS n_pos, nn AS n_neg,
             r2 - np * (np + 1) AS u_times2,
             round((r2 - np * (np + 1)) / (2.0 * np * nn), 6) + 0.0 AS auc
      FROM t"""))

  /** Token-budget corpus mixing (Curation.mixWithEpochs): five heavy
    * sources at 1000 bp, ten at 500 bp, five unweighted, 50k-token
    * budget — so the frame exercises multi-epoch upsampling, partial
    * epochs, and zeroed sources in one result. Everything is BIGINT
    * div/mod plus the splitmix bucket replay; no float anywhere. */
  val q150 = Q(
    "q150_mix_epochs",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").filter($"text".isNotNull)
      val weights = (0 to 4).map(i => s"src$i" -> 1000L) ++
        (5 to 14).map(i => s"src$i" -> 500L)
      Curation.mixWithEpochs(docs, "doc_id", "source",
          size(split($"text", " ")), weights, budgetTokens = 50000L)
        .orderBy($"source")
    },
    Some {
      val caseBp = ((0 to 4).map(i => s"WHEN 'src$i' THEN 1000") ++
        (5 to 14).map(i => s"WHEN 'src$i' THEN 500"))
        .mkString(" ")
      s"""
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        FROM documents WHERE text IS NOT NULL
      ), plan0 AS (
        SELECT source, count(*) AS available_docs,
               CAST(sum(tk) AS BIGINT) AS available_tokens,
               CAST(CASE source $caseBp ELSE 0 END AS BIGINT) AS bp
        FROM d GROUP BY source
      ), plan AS (
        SELECT source, available_docs, available_tokens,
               (50000 * bp) // 10000 AS target_tokens,
               ((50000 * bp) // 10000) // available_tokens AS full_epochs,
               ((((50000 * bp) // 10000) % available_tokens) * 10000)
                 // available_tokens AS rem_bp
        FROM plan0
      ), rem AS (
        SELECT d.source, count(*) AS rem_docs,
               CAST(sum(d.tk) AS BIGINT) AS rem_tokens
        FROM d JOIN plan p ON p.source = d.source
        WHERE ${bucketSql("d.doc_id")} < p.rem_bp
        GROUP BY d.source)
      SELECT p.source, p.available_docs, p.available_tokens,
             p.target_tokens, p.full_epochs, p.rem_bp,
             coalesce(r.rem_docs, 0) AS rem_docs,
             coalesce(r.rem_tokens, 0) AS rem_tokens,
             p.full_epochs * p.available_tokens
               + coalesce(r.rem_tokens, 0) AS effective_tokens
      FROM plan p LEFT JOIN rem r ON r.source = p.source
      ORDER BY p.source"""
    })

  /** OPTIMIZE-shape small-file compaction plan
    * ([[graft.io.Store.compactionPlan]]): a synthetic file listing
    * derived from `part` (skewed sizes: mostly KB-scale small files
    * with every 13th a near-target large one) greedily bin-packed to
    * 8 MB groups in path order without splitting — the bin is the
    * exclusive-prefix-sum byte offset div target, so a bin overshoots
    * by at most one file. Output: per-bin file count, bytes, and the
    * path span. The oracle replays the exclusive cumsum as a window
    * (fine at oracle scale; the Spark side is the one-range-shuffle
    * prefix sum) and the same integer div. */
  val q159 = Q(
    "q159_compaction_plan",
    (s, d) => {
      import s.implicits._
      val k = $"p_partkey"
      val files = t(s, d, "part").select(
        concat(lit("data/part-"),
          lpad(k.cast("string"), 12, "0"), lit(".parquet")).as("path"),
        (when(k % 13 === 0, 6000000L).otherwise(0L) +
          (k * 7919) % 500000 + 50000).cast("long").as("bytes"))
      graft.io.Store.compactionPlan(files, "path", "bytes",
          targetBytes = 8388608L)
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bin_bytes"),
          min($"path").as("first_path"), max($"path").as("last_path"))
        .orderBy($"bin")
    },
    Some("""
      WITH files AS (
        SELECT 'data/part-' || lpad(CAST(p_partkey AS VARCHAR), 12, '0')
                 || '.parquet' AS path,
               CAST(CASE WHEN p_partkey % 13 = 0 THEN 6000000 ELSE 0 END
                 + (p_partkey * 7919) % 500000 + 50000 AS BIGINT) AS bytes
        FROM part
      ), offs AS (
        SELECT path, bytes,
               coalesce(sum(bytes) OVER (ORDER BY path
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS off
        FROM files
      )
      SELECT CAST(off // 8388608 AS BIGINT) AS bin,
             count(*) AS n_files,
             CAST(sum(bytes) AS BIGINT) AS bin_bytes,
             min(path) AS first_path, max(path) AS last_path
      FROM offs GROUP BY 1 ORDER BY 1"""))

  /** The fuzzy-dedup pipeline as ONE integration row — the exact chain
    * a 100 TB curation run executes: MinHash-LSH candidate pairs
    * (q33's operator) → exact-Jaccard VERIFY on the candidates only
    * (two id-keyed joins against the per-doc shingle-hash sets — never
    * all-pairs) → connected components → canonical keep-id per
    * component (max n_chars, ties → min id) → the component-keyed
    * deterministic split ([[Curation.hashSplit]] on the component
    * label, the engine of q148's leakageSafeSplit — applied HERE to the
    * canonicalized frame so the interaction is pinned: every member of
    * a component, canonical or dropped, must land in the same split as
    * its keep-id). The oracle replays minhash signatures + banding
    * (DuckOracle.mixPairs), the string-set Jaccard verify, the
    * transitive closure (recursive CTE — oracle scale only), the winner
    * rule and the splitmix bucket arithmetic. */
  val q156 = Q(
    "q156_neardup_pipeline",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val cands = Dedup.minHashCandidates(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8)
      // Verify prefilter: semi-join the shingle-set table down to docs
      // that appear in SOME candidate pair before the two verify joins —
      // at corpus scale the candidate set is a small fraction of the
      // corpus (that is the point of LSH), and under AQE the distinct
      // candidate-id frame broadcasts at runtime, so the heavy
      // shingle-array rows of NON-candidates are filtered map-side and
      // never shuffle at all.
      val candIds = cands.select($"id_a".as("doc_id"))
        .unionByName(cands.select($"id_b".as("doc_id"))).distinct()
      val sh = Dedup.withShingleHashes(docs, "text", 3)
        .select($"doc_id", $"sh_hs")
        .join(candIds, Seq("doc_id"), "left_semi")
      val verified = cands
        .join(sh.select($"doc_id".as("id_a"), $"sh_hs".as("hs_a")),
          Seq("id_a"))
        .join(sh.select($"doc_id".as("id_b"), $"sh_hs".as("hs_b")),
          Seq("id_b"))
        .withColumn("n_common",
          size(array_intersect($"hs_a", $"hs_b")).cast("long"))
        .withColumn("jaccard", $"n_common" /
          (size($"hs_a") + size($"hs_b") - $"n_common"))
        .filter($"jaccard" >= 0.4)
        .select($"id_a", $"id_b")
      val canon = Dedup.canonicalize(docs, verified, "doc_id",
        qualityCol = Some("n_chars"))
      Curation.hashSplit(canon, "component",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select($"doc_id", $"component", $"canonical_id",
          $"is_canonical", $"split")
        .orderBy($"doc_id")
    },
    Some {
      val affine = DuckOracle.toSigned(
        "(p.a * h + p.b) % 18446744073709551616::UHUGEINT")
      s"""
      WITH RECURSIVE tk AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
      ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> ${DuckOracle.phU(
                   "array_to_string(list_slice(t, i, i + 2), ' ')")})) AS hs
        FROM tk WHERE len(t) >= 3
      ), sig AS (
        SELECT doc_id,
               list_transform(${DuckOracle.mixPairs(32)},
                 p -> list_min(list_transform(hs, h -> $affine))) AS sig
        FROM hs
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE len(list_filter(range(0, 8),
                bb -> list_slice(a.sig, bb * 4 + 1, bb * 4 + 4)
                    = list_slice(b.sig, bb * 4 + 1, bb * 4 + 4))) > 0
      ), sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1,
                     greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> array_to_string(
                     list_slice(string_split(text, ' '), i, i + 2), ' ')))
                   AS shingle
          FROM documents)
      ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      ), verified AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
        GROUP BY c.id_a, c.id_b, sa.n_sh, sb.n_sh
        HAVING CAST(count(*) AS DOUBLE)
               / (sa.n_sh + sb.n_sh - count(*)) >= 0.4
      ), edges AS (
        SELECT id_a AS u, id_b AS v FROM verified
        UNION
        SELECT id_b AS u, id_a AS v FROM verified
      ), reach AS (
        SELECT u AS src, u AS dst FROM edges
        UNION
        SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON e.u = r.dst
      ), comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
      ), docs2 AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      ), winners AS (
        SELECT component, doc_id AS canonical_id FROM (
          SELECT component, doc_id,
                 row_number() OVER (PARTITION BY component
                   ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM docs2) WHERE rn = 1
      ), b AS (
        SELECT d.doc_id, d.component, w.canonical_id,
               d.doc_id = w.canonical_id AS is_canonical,
               ${bucketSql("d.component")} AS bucket
        FROM docs2 d JOIN winners w ON w.component = d.component
      )
      SELECT doc_id, component, canonical_id, is_canonical,
             CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id"""
    })

  /** Label-propagation communities ([[graft.operators.Graph
    * .labelPropagation]]) — the community tier between near-dup
    * components (q62, which merge everything reachable) and raw pair
    * candidates: densely-linked groups stay apart across sparse
    * bridges, which is what splits a mega-component of chained
    * boilerplate into its real clusters. The synthetic graph is
    * block-local modular arithmetic (two chords inside each 16-id
    * block, the last block shorter), so both engines build the
    * identical edge list; labels, counts and the max-count/min-label
    * winner rule are all integers, so four synchronous rounds are
    * bit-identical at any parallelism. The oracle unrolls the rounds
    * as CTE stages with the row_number() spelling of the same winner
    * rule. Scale: one label-join shuffle + one (node,label) count +
    * one per-node fold per round — never a materialized neighborhood
    * array. */
  val q164 = Q(
    "q164_label_propagation", {
      (s, d) => {
        import s.implicits._
        val nodes = t(s, d, "documents").select($"doc_id".as("id"))
        val nDf = nodes.agg(count(lit(1)).as("n"))
        val chords = (0 until 2).map(j =>
          expr(s"(id div 16) * 16 + (id - (id div 16) * 16 + 1 + 4 * $j)" +
            s" % least(16L, n - (id div 16) * 16)"))
        val edges = nodes.crossJoin(broadcast(nDf))
          .select($"id".as("src"),
            explode(array(chords: _*)).as("dst"))
          // a short trailing block can wrap a chord onto its own node
          // (block size divides 1 + 4j); a self-loop would let a node
          // vote for its own label, deviating from the neighbor-bag
          // LPA semantics — drop it in BOTH engines
          .filter($"src" =!= $"dst")
        graft.operators.Graph.labelPropagation(nodes, edges, iters = 4)
          .select($"id".as("doc_id"), $"community")
          .orderBy($"doc_id")
      }
    }, {
      val iter = (i: Int) => {
        val p = s"l${i - 1}"
        s"""
      c$i AS (
        SELECT ue.src AS id, p.lab AS lab, count(*) AS c
        FROM ue JOIN $p p ON ue.dst = p.id GROUP BY 1, 2
      ), w$i AS (
        SELECT id, lab FROM (
          SELECT id, lab, row_number() OVER (PARTITION BY id
            ORDER BY c DESC, lab ASC) AS rn FROM c$i)
        WHERE rn = 1
      ), l$i AS (
        SELECT n.id, COALESCE(w$i.lab, $p.lab) AS lab
        FROM nodes n
        LEFT JOIN w$i ON n.id = w$i.id
        LEFT JOIN $p ON n.id = $p.id)"""
      }
      Some(s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      cnt AS (SELECT count(*) AS n FROM nodes),
      e0 AS (
        SELECT id AS src,
               (id // 16) * 16 + (id - (id // 16) * 16 + 1 + 4 * j)
                 % least(16, cnt.n - (id // 16) * 16) AS dst
        FROM nodes CROSS JOIN cnt
        CROSS JOIN (SELECT unnest([0, 1]) AS j)
      ),
      e1 AS (SELECT src, dst FROM e0 WHERE src != dst),
      ue AS (SELECT src, dst FROM e1
             UNION ALL SELECT dst AS src, src AS dst FROM e1),
      l0 AS (SELECT id, id AS lab FROM nodes),${(1 to 4).map(iter).mkString(",")}
      SELECT id AS doc_id, CAST(lab AS BIGINT) AS community
      FROM l4 ORDER BY doc_id""")
    })

  /** Sketch-thresholded adaptive quality filter — the per-group trim a
    * corpus pipeline runs when one global cutoff is wrong for every
    * group (each language's quality distribution differs): per-lang
    * [[graft.operators.QuantileHist]] over an integer lexical-diversity
    * score (distinct tokens ·10^6 div tokens), P25 read from the
    * ≤2k-row sketch, threshold broadcast-joined back, docs below it
    * dropped. The q151 terciles row ranks with a full per-group window
    * sort; THIS is the shape that replaces it at 100 TB — one map-side-
    * combinable histogram shuffle builds kilobyte state per group, the
    * data itself is never sorted, and the join back is a broadcast.
    * All arithmetic integer (bucket index, midpoint, ceil-rank), so the
    * oracle replays the sketch and the filter exactly. */
  val q166 = Q(
    "q166_adaptive_quality_filter",
    (s, d) => {
      import s.implicits._
      import graft.operators.QuantileHist
      val docs = t(s, d, "documents")
      val scored = docs.select($"lang",
        expr("""(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)
                 * 1000000)
                div CAST(size(split(text, ' ')) AS BIGINT)""").as("score"))
      val hist = QuantileHist.histogram(scored, Seq("lang"), "score")
      val thr = QuantileHist.quantiles(hist, Seq("lang"), Seq(25))
        .select($"lang", $"est".as("thr"))
      scored.join(broadcast(thr), Seq("lang"))
        .groupBy($"lang", $"thr")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"score" >= $"thr", 1L).otherwise(0L)).as("n_kept"))
        .select($"lang", $"n_docs", $"thr", $"n_kept",
          ($"n_docs" - $"n_kept").as("n_dropped"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH sc AS (
        SELECT lang,
               (CAST(len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) * 1000000)
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        FROM documents
      ), h AS (
        SELECT lang,
               ${graft.operators.QuantileHist.bucketIdxSql("score")}
                 AS bucket,
               count(*) AS cnt
        FROM sc GROUP BY 1, 2
      ), c AS (
        SELECT lang, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        FROM h
      ), thr AS (
        SELECT lang,
               ${graft.operators.QuantileHist.bucketMidSql("bucket")}
                 AS thr
        FROM c
        WHERE cum - cnt < (25 * n + 99) // 100
          AND cum >= (25 * n + 99) // 100
      )
      SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(thr.thr AS BIGINT) AS thr,
             CAST(sum(CASE WHEN sc.score >= thr.thr THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(count(*) - sum(CASE WHEN sc.score >= thr.thr
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM sc JOIN thr ON sc.lang = thr.lang
      GROUP BY sc.lang, thr.thr
      ORDER BY sc.lang"""))

  /** Incremental dedup against a persisted LSH index
    * ([[graft.operators.Dedup.minHashIndex]] /
    * [[graft.operators.Dedup.incrementalCandidates]]) — the
    * daily-ingest pattern: the corpus (doc_id % 5 ≠ 0) is indexed
    * once; the new batch (doc_id % 5 = 0) probes it with a BROADCAST
    * of its own band rows, so old-vs-old pairs are never recomputed
    * and the corpus never shuffles. The oracle replays signatures,
    * banding, the new-vs-corpus probe, the new-vs-new self-join, and
    * — by construction of its two join predicates — the no-old-vs-old
    * property. est_jaccard = matching-position fraction, k/32, exact
    * in both engines. */
  val q167 = Q(
    "q167_incremental_dedup",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val corpus = docs.filter($"doc_id" % 5L =!= 0L)
      val batch = docs.filter($"doc_id" % 5L === 0L)
      val index = graft.operators.Dedup
        .minHashIndex(corpus, "doc_id", "text")
      graft.operators.Dedup
        .incrementalCandidates(index, batch, "doc_id", "text")
        .orderBy($"kind", $"id_a", $"id_b")
    },
    Some {
      val affine = DuckOracle.toSigned(
        "(p.a * h + p.b) % 18446744073709551616::UHUGEINT")
      val bandMatch = (a: String, b: String) =>
        s"""len(list_filter(range(0, 8),
              bb -> list_slice($a.sig, bb * 4 + 1, bb * 4 + 4)
                  = list_slice($b.sig, bb * 4 + 1, bb * 4 + 4))) > 0"""
      val estJ = (a: String, b: String) =>
        s"""len(list_filter(range(1, 33),
              i -> $a.sig[i] = $b.sig[i])) / 32.0"""
      s"""
      WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
      ), hs AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                 i -> ${DuckOracle.phU(
                   "array_to_string(list_slice(t, i, i + 2), ' ')")})) AS hs
        FROM tk WHERE len(t) >= 3
      ), sig AS (
        SELECT doc_id,
               list_transform(${DuckOracle.mixPairs(32)},
                 p -> list_min(list_transform(hs, h -> $affine))) AS sig
        FROM hs
      ), corpus AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
      batch AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
      vc AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               'vs_corpus' AS kind, ${estJ("a", "b")} AS est_jaccard
        FROM corpus a JOIN batch b ON ${bandMatch("a", "b")}
      ), vb AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               'vs_batch' AS kind, ${estJ("a", "b")} AS est_jaccard
        FROM batch a JOIN batch b
          ON a.doc_id < b.doc_id AND ${bandMatch("a", "b")}
      )
      SELECT id_a, id_b, kind, est_jaccard FROM vc
      UNION ALL
      SELECT id_a, id_b, kind, est_jaccard FROM vb
      ORDER BY kind, id_a, id_b"""
    })

  /** Length-bucketed batching vs naive id-order batching
    * ([[graft.operators.Curation.lengthBucketedBatches]] /
    * [[graft.operators.Curation.paddingCensus]]) — the dynamic-padding
    * efficiency census: a batch's compute is batchSize × its longest
    * member, so batching by length bucket (ONE hash shuffle on the
    * bounded `len div 16` key, per-bucket ordering, never a global
    * sort) caps per-row padding below the bucket width, while naive
    * contiguous-id batches pad each batch to whatever long doc landed
    * in it. All arithmetic integer; the oracle replays both
    * assignments and both censuses relationally. */
  val q170 = Q(
    "q170_padding_census",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val toks = docs.select($"doc_id".as("id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("len"))
      val naive = graft.operators.Curation.paddingCensus(
        toks.withColumn("batch_id", expr("id div 32")))
      val bucketed = graft.operators.Curation.paddingCensus(
        graft.operators.Curation.lengthBucketedBatches(
          docs, "doc_id", size(split($"text", " ")),
          batchSize = 32, bucketWidth = 16))
      bucketed.select(lit("length_bucketed").as("strategy"),
          $"n_batches", $"n_rows", $"total_tokens", $"total_padding")
        .unionAll(naive.select(lit("naive").as("strategy"),
          $"n_batches", $"n_rows", $"total_tokens", $"total_padding"))
        .orderBy($"strategy")
    },
    Some("""
      WITH t AS (
        SELECT doc_id AS id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents
      ), na AS (
        SELECT id, len, id // 32 AS batch_id FROM t
      ), bu AS (
        SELECT id, len,
               (len // 16) * 1048576
                 + (row_number() OVER (PARTITION BY len // 16
                      ORDER BY len, id) - 1) // 32 AS batch_id
        FROM t
      ), cn AS (
        SELECT batch_id, count(*) AS n, max(len) AS mx, sum(len) AS s
        FROM na GROUP BY 1
      ), cb AS (
        SELECT batch_id, count(*) AS n, max(len) AS mx, sum(len) AS s
        FROM bu GROUP BY 1
      )
      SELECT 'length_bucketed' AS strategy,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(s) AS BIGINT) AS total_tokens,
             CAST(sum(mx * n - s) AS BIGINT) AS total_padding
      FROM cb
      UNION ALL
      SELECT 'naive' AS strategy,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(s) AS BIGINT) AS total_tokens,
             CAST(sum(mx * n - s) AS BIGINT) AS total_padding
      FROM cn
      ORDER BY strategy"""))

  /** k-anonymity audit over quasi-identifiers — the compliance gate a
    * corpus release runs before publishing per-document metadata: rows
    * whose (lang, source, coarsened-length) equivalence class has
    * fewer than k members are re-identifiable by those attributes
    * alone (Sweeney 2002) and must be suppressed or generalized. Per
    * (lang, source): class count, the slice's k-anonymity (min class
    * size), and how many rows suppression at k=5 would cost. One
    * map-side-combinable class count + one tiny rollup — the audit
    * never touches document content. */
  val q171 = Q(
    "q171_k_anonymity",
    (s, d) => {
      import s.implicits._
      val cls = Curation.equivalenceClasses(t(s, d, "documents"),
        Seq($"lang", $"source", expr("n_chars div 64").as("len_class")))
      cls.groupBy($"lang", $"source")
        .agg(sum($"sz").as("n_rows"),
          count(lit(1)).as("n_classes"),
          min($"sz").as("k_anonymity"),
          sum(when($"sz" < 5L, $"sz").otherwise(0L))
            .as("n_suppressed_at_k5"))
        .orderBy($"lang", $"source")
    },
    Some("""
      WITH cls AS (
        SELECT lang, source, n_chars // 64 AS len_class,
               count(*) AS sz
        FROM documents GROUP BY 1, 2, 3
      )
      SELECT lang, source,
             CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(min(sz) AS BIGINT) AS k_anonymity,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
               AS n_suppressed_at_k5
      FROM cls GROUP BY 1, 2
      ORDER BY lang, source"""))

  /** Salted skew join, exact-oracle-gated (the last LLM-pipeline
    * operator that was spec-only): [[graft.operators.SaltedJoin]] with
    * the portable splitmix salt, on the hottest natural key in the
    * corpus — `lang`, whose top value (`en`) holds ~44% of all
    * documents, the shape where a plain hash join serializes nearly
    * half the table through one task. The
    * oracle replays the WHOLE salted pipeline relationally in DuckDB:
    * splitmix64(doc_id) low-53-bit mod-8 salt, ×8 `generate_series`
    * replication of the dim side, the (key, salt) equi join, and the
    * per-lang rollup — so the per-(lang, salt) census hash-checks the
    * salt assignment bit-for-bit and `dim_sum = n_joined × lang_docs`
    * certifies the replication join hit exactly one dim copy per row
    * (the salted output ≡ plain join; SaltedJoinSpec asserts the same
    * for the production xxhash64 salt on a 90%-hot-key fixture). */
  val q172 = Q(
    "q172_salted_join",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val dim = docs.groupBy($"lang").agg(count(lit(1)).as("lang_docs"))
      val joined = graft.operators.SaltedJoin.innerWithSalt(
        docs, dim, "lang",
        graft.operators.SaltedJoin.portableSalt($"doc_id", 8), 8)
      val perLang = joined.groupBy($"lang").agg(
        count(lit(1)).as("n_joined"),
        sum($"n_chars").as("chars_sum"),
        sum($"lang_docs").as("dim_sum"))
      docs.withColumn("salt",
          graft.operators.SaltedJoin.portableSalt($"doc_id", 8))
        .groupBy($"lang", $"salt").agg(count(lit(1)).as("n_docs"))
        .join(perLang, "lang")
        .select($"lang", $"salt", $"n_docs", $"n_joined", $"chars_sum",
          $"dim_sum")
        .orderBy($"lang", $"salt")
    },
    Some(s"""
      WITH dim AS (
        SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang
      ), salted AS (
        SELECT lang, n_chars,
               CAST(((${DuckOracle.mix(
      s"(CAST(doc_id AS UHUGEINT) + $Gamma) % 18446744073709551616::UHUGEINT")})
                 % 9007199254740992::UHUGEINT) % 8::UHUGEINT AS BIGINT)
                 AS salt
        FROM documents
      ), rep AS (
        SELECT lang, lang_docs, unnest(generate_series(0, 7)) AS salt
        FROM dim
      ), joined AS (
        SELECT s.lang, s.n_chars, r.lang_docs
        FROM salted s JOIN rep r ON s.lang = r.lang AND s.salt = r.salt
      ), per_lang AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_joined,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(lang_docs) AS BIGINT) AS dim_sum
        FROM joined GROUP BY lang
      ), census AS (
        SELECT lang, salt, CAST(count(*) AS BIGINT) AS n_docs
        FROM salted GROUP BY lang, salt
      )
      SELECT c.lang, c.salt, c.n_docs, p.n_joined, p.chars_sum, p.dim_sum
      FROM census c JOIN per_lang p USING (lang)
      ORDER BY lang, salt"""))

  /** l-diversity audit — the companion gate to q171's k-anonymity
    * (Machanavajjhala 2007): a class can be large (k-anonymous) yet
    * still leak if every member shares the same SENSITIVE value, so a
    * release also requires each quasi-identifier class to contain ≥ l
    * distinct sensitive values. Here the release publishes (lang,
    * coarsened-length) per document and `source` is the sensitive
    * attribute: per lang — class count, the slice's l-diversity (min
    * distinct sources over its classes), and the row cost of
    * suppressing classes below l = 3. Same scale shape as q171: one
    * map-side-combinable class aggregate (count-distinct over ≤ a
    * handful of sources per class) + one tiny rollup; content never
    * read. */
  val q173 = Q(
    "q173_l_diversity",
    (s, d) => {
      import s.implicits._
      val cls = Curation.equivalenceClasses(t(s, d, "documents"),
        Seq($"lang", expr("n_chars div 64").as("len_class")),
        sensitive = Some($"source"))
      cls.groupBy($"lang")
        .agg(sum($"sz").as("n_rows"),
          count(lit(1)).as("n_classes"),
          min($"l_div").as("l_diversity"),
          sum(when($"l_div" < 3L, $"sz").otherwise(0L))
            .as("n_suppressed_at_l3"))
        .orderBy($"lang")
    },
    Some("""
      WITH cls AS (
        SELECT lang, n_chars // 64 AS len_class,
               count(*) AS sz,
               count(DISTINCT source) AS l_div
        FROM documents GROUP BY 1, 2
      )
      SELECT lang,
             CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(min(l_div) AS BIGINT) AS l_diversity,
             CAST(sum(CASE WHEN l_div < 3 THEN sz ELSE 0 END) AS BIGINT)
               AS n_suppressed_at_l3
      FROM cls GROUP BY 1
      ORDER BY lang"""))

  val all: Seq[Q] =
    Seq(q53, q54, q55, q56, q91, q94, q96, q98, q106, q107, q108, q118,
      q125, q128, q132, q133, q135, q141, q143, q145, q148, q149, q150,
      q156, q159, q164, q166, q167, q170, q171, q172, q173)
}
