package graft.queries

import graft.Q
import graft.Q.t
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators on the `documents` table: text
  * statistics / quality scoring, stopword language scoring, document
  * fingerprinting, n-gram Jaccard near-dup pairs (oracle-checked), and
  * MinHash-LSH / SimHash (rows-only — their hash families are not
  * reproducible in DuckDB SQL; correctness is asserted by ScalaTest specs
  * on documents with known overlap instead).
  */
object TextQ {

  /** Token counting + quality features. All integer-derived arithmetic →
    * bit-exact across engines (single division per ratio). */
  val q29 = Q(
    "q29_text_stats",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", $"n_chars",
          length($"text").cast("long").as("n_chars_calc"),
          size(split($"text", " ")).cast("long").as("n_tokens"),
          ((length($"text") - (size(split($"text", " ")) - 1)).cast("double")
            / size(split($"text", " "))).as("mean_token_len"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, n_chars,
             length(text) AS n_chars_calc,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_token_len
      FROM documents
      ORDER BY doc_id"""))

  /** Stopword-hit language scoring (lang-ID heuristic): non-distinct hit
    * counts per language list via a filter lambda — same lambda in DuckDB. */
  val q30 = Q(
    "q30_lang_scores",
    (s, d) => {
      import s.implicits._
      val toks = TextAnalysis.tokens($"text")
      t(s, d, "documents")
        .select($"doc_id", $"lang",
          TextAnalysis.hitCount(toks, TextAnalysis.stopwords("en")).as("hits_en"),
          TextAnalysis.hitCount(toks, TextAnalysis.stopwords("de")).as("hits_de"),
          TextAnalysis.hitCount(toks, TextAnalysis.stopwords("fr")).as("hits_fr"),
          TextAnalysis.hitCount(toks, TextAnalysis.stopwords("es")).as("hits_es"))
        .orderBy($"doc_id")
    },
    Some {
      def inList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")
      s"""
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '),
                 w -> w IN (${inList(TextAnalysis.stopwords("en"))}))) AS hits_en,
             len(list_filter(string_split(text, ' '),
                 w -> w IN (${inList(TextAnalysis.stopwords("de"))}))) AS hits_de,
             len(list_filter(string_split(text, ' '),
                 w -> w IN (${inList(TextAnalysis.stopwords("fr"))}))) AS hits_fr,
             len(list_filter(string_split(text, ' '),
                 w -> w IN (${inList(TextAnalysis.stopwords("es"))}))) AS hits_es
      FROM documents
      ORDER BY doc_id"""
    })

  /** Prefix fingerprint dedup: md5 of the first 8 tokens as the dedup
    * key; groups with copies collapse to (fingerprint, n, keep_id). */
  val q31 = Q(
    "q31_fingerprint_dedup",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy(TextAnalysis.prefixFingerprint($"text", 8).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_id"))
        .orderBy($"fp")
    },
    Some("""
      SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')) AS fp,
             count(*) AS n_docs, min(doc_id) AS keep_id
      FROM documents
      GROUP BY 1
      ORDER BY fp"""))

  /** N-gram (3-shingle) Jaccard near-dup pairs within the same lang-free
    * corpus, via shared-shingle equi-join (no cross join). Jaccard is a
    * single integer division → bit-exact. */
  val q32 = Q(
    "q32_ngram_jaccard",
    (s, d) => {
      import s.implicits._
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        k = 3, threshold = 0.12)
        .select($"id_a", $"id_b", $"n_common", $"jaccard")
        .orderBy($"id_a", $"id_b")
    },
    Some("""
      WITH sh AS (
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
      )
      SELECT id_a, id_b, n_common,
             CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.12
      ORDER BY id_a, id_b"""))

  /** MinHash-LSH near-dup candidates — rows-only check (xxhash64 family
    * not reproducible in the oracle); ScalaTest asserts recall vs exact
    * Jaccard on the same table. */
  val q33 = Q(
    "q33_minhash_lsh",
    (s, d) => {
      import s.implicits._
      Dedup.minHashCandidates(t(s, d, "documents"), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8)
        .orderBy($"id_a", $"id_b")
    },
    None)

  /** SimHash near-dup candidates (Hamming ≤ 3) — rows-only check. */
  val q34 = Q(
    "q34_simhash",
    (s, d) => {
      import s.implicits._
      Dedup.simHashCandidates(t(s, d, "documents"), "doc_id", "text",
        maxDist = 3)
        .orderBy($"id_a", $"id_b")
    },
    None)

  /** Rolling-hash exact-dup fingerprint (Rabin-Karp base 31, wrapping
    * 64-bit) — same integer recurrence in DuckDB via list_reduce. */
  val q35 = Q(
    "q35_rolling_hash",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", TextAnalysis.rollingHash($"text").as("rhash"))
        .orderBy($"doc_id")
    },
    None) // 64-bit wrap-around semantics differ (DuckDB raises on overflow)

  val all: Seq[Q] = Seq(q29, q30, q31, q32, q33, q34, q35)
}
