package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileHistSpec extends SparkSpec {
  import spark.implicits._

  private def vals(xs: Seq[Long], key: String) =
    xs.map((key, _)).toDF("k", "v")

  test("bucket index is monotone and contiguous across the full range") {
    // every value maps to a bucket; consecutive values never skip more
    // than one bucket and never decrease (the log-linear lattice)
    val xs = (0L to 4096L) ++ (1 to 40).map(i => (1L << 40) + i * 12345L)
    val idx = vals(xs, "k")
      .select(QuantileHist.bucketIdx($"v").as("b"), $"v")
      .orderBy($"v").select($"b").as[Long].collect()
    idx.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"monotone violated: $a -> $b")
    }
    // linear range is exact
    assert(idx.take(64).zipWithIndex.forall { case (b, i) => b == i })
  }

  test("midpoint reconstruction lands inside its own bucket with " +
      "relative error <= 2^-K") {
    val xs = Seq(1L, 63L, 64L, 100L, 1000L, 123456L, 98765432L,
      (1L << 40) + 7L)
    val rows = vals(xs, "k")
      .select($"v", QuantileHist.bucketMid(QuantileHist.bucketIdx($"v"))
        .as("mid"))
      .as[(Long, Long)].collect()
    rows.foreach { case (v, mid) =>
      val rel = math.abs(mid - v).toDouble / v.toDouble
      assert(rel <= math.pow(2.0, -QuantileHist.K) + 1e-12,
        s"value $v reconstructed $mid (rel $rel)")
    }
  }

  test("merge is lossless: histogram of a union == count-sum of " +
      "per-part histograms (the roll-up contract)") {
    val a = vals((1L to 3000L).map(i => i * 7 % 5000), "x")
    val b = vals((1L to 4000L).map(i => i * 13 % 9000), "x")
    val direct = QuantileHist.histogram(a.union(b), Seq("k"), "v")
    val merged = QuantileHist.merge(
      QuantileHist.histogram(a, Seq("k"), "v")
        .union(QuantileHist.histogram(b, Seq("k"), "v")), Seq("k"))
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
  }

  test("sketch quantiles track exact quantiles within the error bound") {
    val xs = (1L to 10000L).map(i => (i * i) % 100000L + 1L)
    val df = vals(xs, "k")
    val hist = QuantileHist.histogram(df, Seq("k"), "v")
    val est = QuantileHist.quantiles(hist, Seq("k"), Seq(50, 90, 99))
      .select($"p", $"est").as[(Long, Long)].collect().toMap
    val sorted = xs.sorted
    Seq(50, 90, 99).foreach { p =>
      val rank = (p * xs.length + 99) / 100
      val exact = sorted(rank.toInt - 1)
      val rel = math.abs(est(p.toLong) - exact).toDouble / exact.toDouble
      assert(rel <= math.pow(2.0, -QuantileHist.K) + 1e-12,
        s"p$p est ${est(p.toLong)} vs exact $exact (rel $rel)")
    }
  }
}
