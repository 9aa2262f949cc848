package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force definition: AUC = (concordant + ties/2) / (n⁺ n⁻). */
  private def bruteAuc(rows: Seq[(Double, Long)]): Double = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    num / (pos.size.toDouble * neg.size)
  }

  test("exactAuc matches brute-force pair counting with heavy ties") {
    val rnd = new scala.util.Random(11)
    // quantized scores force ties; label correlates weakly with score
    val rows = (1 to 300).map { _ =>
      val s = rnd.nextInt(8) / 7.0
      val y = if (rnd.nextDouble() < 0.3 + 0.4 * s) 1L else 0L
      (s, y)
    }
    val out = Eval.exactAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    val np = rows.count(_._2 == 1L).toLong
    val nn = rows.size - np
    assert(out.getAs[Long]("n_pos") == np)
    assert(out.getAs[Long]("n_neg") == nn)
    val expected = bruteAuc(rows)
    // u_times2 is exact: 2 * U = 2 * auc * np * nn must be an integer
    assert(out.getAs[Long]("u_times2") ==
      math.round(expected * 2 * np * nn))
    assert(math.abs(out.getAs[Double]("auc") - expected) < 1e-12)
  }

  test("exactAuc: perfect separation is 1, anti-separation is 0, " +
      "constant score is 0.5") {
    val sep = (1 to 20).map(i => (i / 20.0, if (i > 10) 1L else 0L))
    assert(Eval.exactAuc(sep.toDF("s", "y"), col("s"), col("y"))
      .collect().head.getAs[Double]("auc") == 1.0)
    val anti = sep.map { case (s, y) => (s, 1L - y) }
    assert(Eval.exactAuc(anti.toDF("s", "y"), col("s"), col("y"))
      .collect().head.getAs[Double]("auc") == 0.0)
    val const = (1 to 20).map(i => (0.5, (i % 2).toLong))
    assert(Eval.exactAuc(const.toDF("s", "y"), col("s"), col("y"))
      .collect().head.getAs[Double]("auc") == 0.5)
  }

  test("exactAuc is invariant to partitioning") {
    val rows = (1 to 200).map(i =>
      ((i % 13) / 13.0, ((i * 7) % 3 == 0).compareTo(false).toLong))
    val df1 = rows.toDF("s", "y").repartition(1)
    val df8 = rows.toDF("s", "y").repartition(8)
    val a = Eval.exactAuc(df1, col("s"), col("y")).collect().head
    val b = Eval.exactAuc(df8, col("s"), col("y")).collect().head
    assert(a.getAs[Long]("u_times2") == b.getAs[Long]("u_times2"))
    assert(a.getAs[Double]("auc") == b.getAs[Double]("auc"))
  }
}
