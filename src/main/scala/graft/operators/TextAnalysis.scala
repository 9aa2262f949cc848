package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-hit heuristic), quality scoring, token counting,
  * and document fingerprinting. All pure `functions._` column expressions
  * (whole-stage codegen; no UDFs), embarrassingly parallel per row — the
  * shape that scales linearly to 100 TB of documents.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Real deployments would broadcast larger lists; the
    * mechanism (array_intersect-free lambda count, codegen'd) is the same. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que"))

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Non-distinct count of tokens that belong to `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val lits = array(words.map(lit): _*)
    size(filter(toks, w => array_contains(lits, w))).cast("long")
  }

  /** Language-ID: per-language stopword hit counts; detected = argmax
    * (ties broken by language code order, deterministic). */
  def langScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = stopwords.toSeq.sortBy(_._1).foldLeft(df) {
      case (acc, (lang, words)) =>
        acc.withColumn(s"hits_$lang", hitCount(toks, words))
    }
    val langs = stopwords.keys.toSeq.sorted
    // argmax via greatest over (hits, neg-codepoint, lang) structs — ties
    // resolve to the alphabetically-first language, deterministically:
    val detected = langs
      .map(l => struct(col(s"hits_$l").as("h"),
        lit(-l.codePointAt(0)).as("neg"), lit(l).as("l")))
      .reduceLeft((a, b) => greatest(a, b))
    scored.withColumn("detected_lang", detected.getField("l"))
  }

  /** Quality score features: length, token count, mean token length,
    * punctuation/digit/uppercase ratios, stopword ratio — the classic
    * C4/Gopher-style filters, all codegen'd arithmetic. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        (length(t) - (size(toks) - 1)).cast("double") / size(toks))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
          / length(t))
      .withColumn("stop_ratio",
        hitCount(toks, stopwords("en")).cast("double") / size(toks))
  }

  /** BPE-ish token estimate: whitespace words plus an extra token per
    * punctuation/digit run (a cheap, deterministic proxy for subword
    * tokenizers — useful for corpus token accounting at scale). */
  def tokenEstimate(text: Column): Column =
    (size(split(text, " ")) +
      size(filter(split(regexp_replace(text, "[a-zA-Z ]+", " "), " "),
        s => length(s) > 0))).cast("long")

  /** Document fingerprint: hash of the first k tokens (prefix dedup key —
    * the cheap first-pass dedup for crawl corpora). */
  def prefixFingerprint(text: Column, k: Int = 8): Column =
    md5(concat_ws(" ", slice(split(text, " "), 1, k)))

  /** Rolling-hash fingerprint (Rabin-Karp base-31 mod 1e9+7 over the whole
    * text — exact-dup key that is cheap to compute incrementally at scale;
    * the modulus keeps the fold in range under ANSI arithmetic). One
    * codegen byte loop (graft.functions.Expressions.RollingHash31) — the
    * per-character split + interpreted aggregate it replaces paid a
    * lambda dispatch per CHARACTER of the corpus. */
  def rollingHash(text: Column): Column =
    graft.functions.Expressions.rollingHash31(text)
}
