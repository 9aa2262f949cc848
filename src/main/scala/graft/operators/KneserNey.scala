package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney trigram language model (Kneser & Ney 1995;
  * Chen & Goodman 1998's interpolated variant with a single fixed
  * discount) — the smoothing family production KenLM filters use, one
  * order up from [[TextAnalysis.bigramLmScore]]'s add-k bigram.
  *
  * Three interpolated levels, all derived from the trigram TYPE table:
  *
  *   P1(w3)        = max(N1+(·w3) − D, 0)/B  + (D·W/B)·(1/V)
  *   P2(w3|w2)     = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
  *                   + D·N(w2·)/N1+(·w2·) · P1(w3)        (else P1)
  *   P3(w3|w1w2)   = max(c(w1w2w3) − D, 0)/c(w1w2·)
  *                   + D·N(w1w2·)/c(w1w2·) · P2(w3|w2)    (else P2)
  *
  * where N1+(·x) are continuation counts (distinct left contexts), B =
  * distinct bigram types inside trigrams, W = distinct continuation
  * words, V = vocabulary size, and the uniform 1/V floor at the bottom
  * keeps OOV tokens finite. Each level telescopes to probability mass
  * exactly 1 over the vocabulary (asserted by the spec).
  *
  * Shape at 100 TB: the trigram stream is row-local (slice +
  * arrays_zip, no per-doc window); ONE corpus-sized groupBy builds the
  * trigram type table; every other count is a roll-up of that table
  * (vocab²-scale, orders of magnitude smaller than the corpus);
  * scoring re-joins the trigram stream to the count tables on their
  * natural composite keys (AQE skew handling covers Zipf-hot
  * contexts) and aggregates per doc. B/W/V are driver scalars — the
  * same KB boundary class as the ECDF partition counts.
  */
object KneserNey {

  /** Trained model: count tables (distributed) + the three scalars. */
  final case class KnModel(
      tri: DataFrame, // w1, w2, w3, c3
      ctx2: DataFrame, // w1, w2, cx (= c(w1w2·)), n3 (= N(w1w2·))
      cont2: DataFrame, // w2, w3, k2 (= N1+(·w2w3))
      mid: DataFrame, // w2, md (= N1+(·w2·)), n2 (= N(w2·))
      cont1: DataFrame, // w3, k1 (= N1+(·w3))
      nBigramTypes: Long, // B
      nContWords: Long, // W
      vocab: Long, // V
      discount: Double)

  /** Row-local adjacent trigram stream (slice + arrays_zip — no per-doc
    * window); docs with fewer than three tokens emit nothing. */
  private[graft] def trigramPairs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val l = split(col(textCol), " ")
    val n = greatest(size(l) - 2, lit(0))
    docs
      .withColumn("_a", slice(l, lit(1), n))
      .withColumn("_b", slice(l, lit(2), n))
      .withColumn("_c", slice(l, lit(3), n))
      .select(col(idCol),
        explode(arrays_zip(col("_a"), col("_b"), col("_c"))).as("_t"))
      .select(col(idCol), col("_t._a").as("w1"), col("_t._b").as("w2"),
        col("_t._c").as("w3"))
  }

  /** Train on a corpus: one corpus-sized trigram groupBy, then
    * type-table roll-ups. */
  def train(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", discount: Double = 0.75): KnModel = {
    val tri = trigramPairs(corpus, idCol, textCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("cx"), count(lit(1)).as("n3"))
    val cont2 = tri.groupBy("w2", "w3").agg(count(lit(1)).as("k2"))
    val mid = cont2.groupBy("w2")
      .agg(sum(col("k2")).as("md"), count(lit(1)).as("n2"))
    val cont1 = cont2.groupBy("w3").agg(count(lit(1)).as("k1"))
    val Array(b, w) = cont2
      .agg(count(lit(1)), countDistinct(col("w3"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val v = corpus
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    KnModel(tri, ctx2, cont2, mid, cont1, b, w, v, discount)
  }

  /** Append interpolated probabilities p1/p2/p3 to an arbitrary
    * (w1, w2, w3) frame — the scoring kernel, also the spec's surface
    * for the sums-to-one normalization proof. Literal arrangement of
    * every double op mirrors the DuckDB oracle exactly so drift stays
    * in the last bits (absorbed by the emit rounding). */
  def scoreTrigrams(tris: DataFrame, m: KnModel): DataFrame = {
    val d = m.discount
    val joined = tris
      .join(m.tri, Seq("w1", "w2", "w3"), "left")
      .join(m.ctx2, Seq("w1", "w2"), "left")
      .join(m.cont2, Seq("w2", "w3"), "left")
      .join(m.mid, Seq("w2"), "left")
      .join(m.cont1, Seq("w3"), "left")
      .withColumn("c3", coalesce(col("c3"), lit(0L)))
      .withColumn("cx", coalesce(col("cx"), lit(0L)))
      .withColumn("n3", coalesce(col("n3"), lit(0L)))
      .withColumn("k2", coalesce(col("k2"), lit(0L)))
      .withColumn("md", coalesce(col("md"), lit(0L)))
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
      .withColumn("k1", coalesce(col("k1"), lit(0L)))
    joined
      .withColumn("p1",
        greatest(col("k1") - lit(d), lit(0.0)) / lit(m.nBigramTypes) +
          lit(d) * lit(m.nContWords) / lit(m.nBigramTypes) *
          (lit(1.0) / lit(m.vocab)))
      .withColumn("p2",
        when(col("md") > 0,
          greatest(col("k2") - lit(d), lit(0.0)) / col("md") +
            lit(d) * col("n2") / col("md") * col("p1"))
          .otherwise(col("p1")))
      .withColumn("p3",
        when(col("cx") > 0,
          greatest(col("c3") - lit(d), lit(0.0)) / col("cx") +
            lit(d) * col("n3") / col("cx") * col("p2"))
          .otherwise(col("p2")))
  }

  /** Score documents against a trained model: per-doc summed trigram
    * log-probability, cross-entropy and perplexity. Docs with fewer
    * than three tokens score NULL (n_trigrams = 0). */
  def score(docs: DataFrame, m: KnModel, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val scored = scoreTrigrams(trigramPairs(docs, idCol, textCol), m)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(log(col("p3"))).as("log_prob"))
      .withColumn("xent", -col("log_prob") / col("n_trigrams"))
      .withColumn("ppl", exp(col("xent")))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("n_trigrams", coalesce(col("n_trigrams"), lit(0L)))
  }

  /** Train on the corpus and score it in-domain (the CCNet-style
    * perplexity-filter shape, KN-smoothed). */
  def knScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", discount: Double = 0.75): DataFrame =
    score(docs, train(docs, idCol, textCol, discount), idCol, textCol)
}
