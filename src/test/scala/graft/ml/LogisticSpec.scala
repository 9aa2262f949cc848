package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogisticSpec extends SparkSpec {
  import spark.implicits._

  test("irlsFit2 recovers planted coefficients; trajectory deterministic") {
    // planted model: b = (-1.0, 0.8, 1.5); deterministic pseudo-uniform
    // u drives the label draw so the test has no RNG
    val (b0t, b1t, b2t) = (-1.0, 0.8, 1.5)
    val data = (0 until 4000).map { i =>
      val f1 = (i % 40) / 10.0           // 0.0 .. 3.9
      val f2 = ((i / 40) % 25) / 25.0    // 0.0 .. 0.96
      val pTrue = 1.0 / (1.0 + math.exp(-(b0t + b1t * f1 + b2t * f2)))
      val u = ((i * 2654435761L) % 10000) / 10000.0
      (f1, f2, if (u < pTrue) 1.0 else 0.0)
    }.toDF("f1", "f2", "y")
    val traj = Logistic.irlsFit2(data, $"f1", $"f2", $"y", iters = 8)
    assert(traj.length == 8)
    val (_, b0, b1, b2) = traj.last
    assert(math.abs(b0 - b0t) < 0.25, s"b0=$b0")
    assert(math.abs(b1 - b1t) < 0.15, s"b1=$b1")
    assert(math.abs(b2 - b2t) < 0.35, s"b2=$b2")
    // converged: the last two iterates agree far tighter than the fit
    val (_, p0, p1, p2) = traj(6)
    assert(math.abs(b0 - p0) + math.abs(b1 - p1) + math.abs(b2 - p2) < 1e-8)
    // exact determinism across a re-fit on a repartitioned frame
    val traj2 = Logistic.irlsFit2(data.repartition(13), $"f1", $"f2", $"y",
      iters = 8)
    traj.zip(traj2).foreach { case ((_, a0, a1, a2), (_, c0, c1, c2)) =>
      assert(math.abs(a0 - c0) < 1e-9 && math.abs(a1 - c1) < 1e-9 &&
        math.abs(a2 - c2) < 1e-9)
    }
  }

  test("score2 is the sigmoid of the linear predictor") {
    val df = Seq((0.0, 0.0), (1.0, 1.0), (5.0, 5.0)).toDF("f1", "f2")
    val s = df.select(Logistic.score2((0.0, 1.0, 1.0), $"f1", $"f2")
      .as("p")).as[Double].collect()
    assert(math.abs(s(0) - 0.5) < 1e-12)
    assert(math.abs(s(1) - 1.0 / (1.0 + math.exp(-2.0))) < 1e-12)
    assert(s(2) > 0.9999)
  }
}
