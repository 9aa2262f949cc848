package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("pq codes are valid codewords; more Lloyd steps don't hurt") {
    val (e1, books1) = Similarity.pqTrain(emb, m = 4, iters = 1)
    val (e2, books2) = Similarity.pqTrain(emb, m = 4, iters = 3)
    assert(books1.length == 4 && books2.length == 4)
    books2.foreach(b => assert(b.nonEmpty && b.forall(_._2.length == 16)))
    val codeCols = (0 until 4).map(s => col(s"pq_code_$s"))
    val bad = e2.filter(codeCols.map(c => c < 0 || c > 15).reduce(_ || _))
    assert(bad.count() == 0)
    // total quantization error is non-increasing with training on this
    // corpus (Lloyd objective; fixed dataset → deterministic check)
    val s1 = e1.agg(sum($"recon_err")).head().getDouble(0)
    val s2 = e2.agg(sum($"recon_err")).head().getDouble(0)
    assert(s2 <= s1 + 1e-9, s"err rose with training: $s1 -> $s2")
  }

  test("ADC distance of a vector to its own codes equals its recon_err") {
    val (encoded, books) = Similarity.pqTrain(emb, m = 4, iters = 2)
    val q = emb.filter($"vec_id" === 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val hits = Similarity.pqAdcTopK(encoded, books, q, k = 1000)
      .filter($"vec_id" === 5).collect()
    assert(hits.length == 1)
    val ownErr = encoded.filter($"vec_id" === 5)
      .select($"recon_err").head().getDouble(0)
    // same kernel, same slice, same summation order → bit-equal
    assert(hits.head.getAs[Double]("adc") == ownErr)
  }
}
