package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on the rug"),
    (4L, "the dog ate a bone"),
    (5L, "cats and dogs"),
    (6L, "hi")).toDF("doc_id", "text")

  test("each KN level sums to exactly 1 over the vocabulary " +
      "(the telescoping-normalization property of interpolated KN)") {
    val m = KneserNey.train(corpus)
    val vocab = corpus
      .select(explode(split($"text", " ")).as("w3")).distinct()
    // a seen trigram context, a seen bigram-only context, and the
    // unigram level itself
    val ctxs = Seq(("the", "cat"), ("sat", "on"), ("dog", "ate"))
    for ((w1, w2) <- ctxs) {
      val tris = vocab.select(lit(w1).as("w1"), lit(w2).as("w2"), $"w3")
      val Seq(s1, s2, s3) = KneserNey.scoreTrigrams(tris, m)
        .agg(sum($"p1"), sum($"p2"), sum($"p3")).head().toSeq
        .map(_.asInstanceOf[Double])
      assert(math.abs(s1 - 1.0) < 1e-9, s"p1 sums to $s1 for ($w1,$w2)")
      assert(math.abs(s2 - 1.0) < 1e-9, s"p2 sums to $s2 for ($w1,$w2)")
      assert(math.abs(s3 - 1.0) < 1e-9, s"p3 sums to $s3 for ($w1,$w2)")
    }
  }

  test("unseen contexts back off: trigram-unseen uses P2, " +
      "bigram-unseen uses P1, and OOV words stay finite via 1/V") {
    val m = KneserNey.train(corpus)
    val tris = Seq(
      ("never", "seen", "mat"), // both contexts unseen -> p3 == p1
      ("xx", "the", "cat"), // trigram ctx unseen, bigram ctx seen
      ("never", "seen", "zzz") // OOV continuation
    ).toDF("w1", "w2", "w3")
    val rows = KneserNey.scoreTrigrams(tris, m)
      .select($"w1", $"p1", $"p2", $"p3")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (p1a, p2a, p3a) = rows("never")
    assert(p2a == p1a && p3a == p2a) // full backoff chain collapses
    val (_, p2b, p3b) = rows("xx")
    assert(p3b == p2b && p2b > 0) // bigram level carries the estimate
    val oov = KneserNey.scoreTrigrams(
      Seq(("never", "seen", "zzz")).toDF("w1", "w2", "w3"), m)
      .select($"p3").head().getDouble(0)
    assert(oov > 0 && oov < 1.0 / m.vocab + 1e-12)
  }

  test("frequent trigrams score higher than rare ones and docs " +
      "shorter than 3 tokens score NULL with n_trigrams = 0") {
    val scored = KneserNey.knScore(corpus)
    val byId = scored.collect().map(r =>
      r.getLong(0) -> r).toMap
    assert(byId(6L).getLong(1) == 0L && byId(6L).isNullAt(2))
    // "the cat" repeats in-domain; doc 1's ppl must be finite > 1
    val ppl1 = byId(1L).getDouble(4)
    assert(ppl1 > 1.0 && !ppl1.isInfinite)
    val m = KneserNey.train(corpus)
    val p = KneserNey.scoreTrigrams(
      Seq(("sat", "on", "the"), ("cats", "and", "dogs"))
        .toDF("w1", "w2", "w3"), m)
      .select($"w1", $"p3").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // "sat on the" occurs twice (docs 1, 3); "cats and dogs" once
    assert(p("sat") > p("cats"))
  }
}
