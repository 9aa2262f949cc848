package graft.functions

import org.apache.commons.math3.special.Erf
import org.scalatest.funsuite.AnyFunSuite

/** Numerical accuracy of the scalar stat kernels, cross-checked against
  * commons-math3 (itself validated against scipy-grade references). */
class StatFuncsSpec extends AnyFunSuite {

  test("erfc matches commons-math3 over the full range") {
    val xs = Seq(-6.0, -3.0, -1.0, -0.3, 0.0, 0.2, 0.46, 0.5, 1.0, 2.0,
      3.9, 4.0, 4.1, 6.0, 10.0, 25.0)
    for (x <- xs) {
      val got = StatFuncs.erfc(x)
      val exp = Erf.erfc(x)
      val tol = math.max(1e-12, math.abs(exp) * 1e-10)
      assert(math.abs(got - exp) <= tol, s"erfc($x): $got vs $exp")
    }
  }

  test("erfcx deep tail stays finite and accurate") {
    // representable range: erfcx(x) = exp(x²)·erfc(x) via commons-math
    for (x <- Seq(5.0, 10.0, 20.0)) {
      val got = StatFuncs.erfcx(x)
      val exp = math.exp(x * x) * Erf.erfc(x)
      assert(math.abs(got - exp) / exp < 1e-9, s"erfcx($x): $got vs $exp")
    }
    // beyond erfc underflow: two-term asymptote 1/(x√π)·(1 − 1/(2x²))
    for (x <- Seq(30.0, 100.0)) {
      val got = StatFuncs.erfcx(x)
      val approx = (1.0 - 1.0 / (2 * x * x)) / (x * math.sqrt(math.Pi))
      assert(math.abs(got - approx) / approx < 1e-3, s"erfcx($x)")
    }
  }

  test("normLogSf matches log(0.5*erfc) where erfc is representable") {
    for (z <- Seq(-3.0, -1.0, 0.0, 1.0, 3.0, 8.0)) {
      val direct = math.log(0.5 * Erf.erfc(z / math.sqrt(2.0)))
      assert(math.abs(StatFuncs.normLogSf(z) - direct) < 1e-9, s"z=$z")
    }
    // deep tail: z=40 → Φ underflows; logSf must stay finite ≈ -z²/2
    val deep = StatFuncs.normLogSf(40.0)
    assert(deep < -780 && deep > -820)
  }

  test("normInv inverts normCdf") {
    for (p <- Seq(1e-12, 1e-6, 0.01, 0.3, 0.5, 0.7, 0.999, 1 - 1e-9)) {
      val z = StatFuncs.normInv(p)
      assert(math.abs(StatFuncs.normCdf(z) - p) < 1e-11 * math.max(1, 1 / p),
        s"p=$p z=$z cdf=${StatFuncs.normCdf(z)}")
    }
    assert(StatFuncs.normInv(0.5) == 0.0 ||
      math.abs(StatFuncs.normInv(0.5)) < 1e-15)
  }

  test("median / percentile / iqr match numpy semantics") {
    assert(StatFuncs.median(Array(1, 3, 2).map(_.toDouble)) == 2.0)
    assert(StatFuncs.median(Array(1, 2, 3, 4).map(_.toDouble)) == 2.5)
    val v = (1 to 9).map(_.toDouble).toArray
    assert(StatFuncs.percentile(v, 25) == 3.0)
    assert(StatFuncs.percentile(v, 50) == 5.0)
    assert(StatFuncs.iqr(v) == 4.0)
    // interpolated case: [1,2,3,4] p25 → 1.75
    assert(StatFuncs.percentile(Array(1, 2, 3, 4).map(_.toDouble), 25) == 1.75)
  }

  test("huber: symmetric data → mean; resistant to outliers") {
    val sym = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val Some((mu, _)) = StatFuncs.huber(sym)
    assert(math.abs(mu - 3.0) < 1e-9)
    val outlier = Array(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0)
    val Some((muR, _)) = StatFuncs.huber(outlier)
    assert(muR < 10.0) // plain mean would be 169
    assert(StatFuncs.huber(Array(5.0, 5.0, 5.0)).isEmpty) // MAD = 0
  }

  test("ecdfCount is the ≤ step count (statsmodels ECDF)") {
    val s = Array(1.0, 2.0, 2.0, 5.0)
    assert(StatFuncs.ecdfCount(s, 0.5) == 0)
    assert(StatFuncs.ecdfCount(s, 1.0) == 1)
    assert(StatFuncs.ecdfCount(s, 2.0) == 3)
    assert(StatFuncs.ecdfCount(s, 4.9) == 3)
    assert(StatFuncs.ecdfCount(s, 5.0) == 4)
    assert(StatFuncs.ecdfCount(s, 9.0) == 4)
  }
}
