package graft.operators

import graft.SparkSpec
import graft.functions.HashFuncs
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.apache.spark.sql.functions._

/** Property-based coverage for the row-local kernels the r7 extension
  * operators rely on: randomized inputs exercise edge shapes the
  * example-based specs don't enumerate. Driver-side generators feed
  * either pure kernel calls or small DataFrames; each property runs the
  * default 100 scalacheck cases. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def holds(p: Prop): Unit =
    assert(check(Parameters.default, p).passed)

  test("zorder2 is a bijection on bounded pairs and preserves box order") {
    val coord = Gen.choose(0L, (1L << 16) - 1)
    holds(forAll(coord, coord) { (a, b) =>
      val z = HashFuncs.zorder2(a, b, 16)
      // de-interleave recovers both inputs exactly
      var ra = 0L; var rb = 0L
      var i = 0
      while (i < 16) {
        ra |= ((z >>> (2 * i)) & 1L) << i
        rb |= ((z >>> (2 * i + 1)) & 1L) << i
        i += 1
      }
      ra == a && rb == b
    })
    holds(forAll(Gen.choose(1, 15)) { k =>
      // every point in the 2^k box keys below every point outside it
      val inMax = HashFuncs.zorder2((1L << k) - 1, (1L << k) - 1, 16)
      val outMin = HashFuncs.zorder2(1L << k, 0L, 16)
      inMax < outMin
    })
  }

  test("URL canonicalization is idempotent on randomized URL shapes") {
    val seg = Gen.alphaLowerStr.map(_.take(5)).suchThat(_.nonEmpty)
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
      www <- Gen.oneOf("", "www.", "WWW.", "www.www.", "WWW.www.")
      host <- seg
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.listOf(seg).map(_.take(3).mkString("/"))
      slash <- Gen.oneOf("", "/", "//")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "ref=h"))
      frag <- Gen.oneOf("", "#frag")
    } yield s"$scheme://$www$host.example$port/$path$slash" +
      (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag
    val urls = Gen.listOfN(40, urlGen).sample.get
    val once = urls.toDF("url")
      .select(Web.canonicalizeUrl($"url")).as[String].collect().toSeq
    val twice = once.toDF("url")
      .select(Web.canonicalizeUrl($"url")).as[String].collect().toSeq
    assert(twice == once)
    // no canonical form retains a fragment, tracking param, or www.
    assert(once.forall(u => !u.contains("#") && !u.contains("utm_") &&
      !u.contains("ref=") && !u.contains("://www.")))
  }

  test("editDistancePairs equals brute force on random short strings") {
    val word = Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val vocab = Gen.listOfN(30, word).sample.get.distinct
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = vocab.toDF("id", "nm")
    val fast = Dedup.editDistancePairs(df, "id", "nm")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val brute = (for {
      (ia, wa) <- vocab; (ib, wb) <- vocab if ia < ib
      if levenshteinRef(wa, wb) <= 1
    } yield (ia, ib)).toSet
    assert(fast == brute)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
