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

  /** Sketch-merge properties spin up several Spark jobs per case, so
    * they run a reduced (but still randomized) case count. */
  private def holds(p: Prop, params: Parameters): Unit =
    assert(check(params, p).passed)

  /** The embargo split's boundary arithmetic, randomized: for any
    * (lo, span, trainPct, embargoUs) the engine labels must equal a
    * driver-side integer recomputation of `lo + (hi−lo)·pct div 100`
    * (which implies the partition is complete and ordered), nulls must
    * land in `unknown`, and the assignment must be invariant under row
    * permutation — the integer-div boundary depends only on the
    * observed min/max, never on partitioning. Each case runs Spark
    * jobs, so the case count is reduced (still randomized). */
  test("temporalEmbargoSplit: labels equal the integer-boundary " +
      "recomputation, nulls → unknown, permutation-invariant") {
    val caseGen = for {
      lo <- Gen.choose(0L, 1L << 40)
      span <- Gen.choose(1L, 1L << 40)
      n <- Gen.choose(2, 50)
      offs <- Gen.listOfN(n, Gen.choose(0L, span))
      nNulls <- Gen.choose(0, 3)
      trainPct <- Gen.choose(1, 99)
      embargoUs <- Gen.choose(0L, 1L << 30)
    } yield (lo, offs, nNulls, trainPct, embargoUs)
    holds(forAll(caseGen) {
      case (lo, offs, nNulls, trainPct, embargoUs) =>
        val us: Seq[Option[Long]] = offs.map(o => Some(lo + o)) ++
          Seq.fill(nNulls)(Option.empty[Long])
        val df = us.zipWithIndex
          .map { case (u, i) => (i.toLong, u) }.toDF("id", "us")
          .withColumn("ts", timestamp_micros($"us"))
        val got = Curation.temporalEmbargoSplit(df, $"ts",
            trainPct, embargoUs)
          .select($"id", $"split").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val present = us.flatten
        val (mn, mx) = (present.min, present.max)
        val b = mn + (mx - mn) * trainPct / 100
        val expect = us.zipWithIndex.map {
          case (None, i) => i.toLong -> "unknown"
          case (Some(u), i) => i.toLong ->
            (if (u <= b) "train"
             else if (u <= b + embargoUs) "embargo"
             else "test")
        }.toMap
        val permuted = Curation.temporalEmbargoSplit(
            df.orderBy(rand(7)).repartition(5), $"ts",
            trainPct, embargoUs)
          .select($"id", $"split").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        got == expect && permuted == expect
    }, Parameters.default.withMinSuccessfulTests(12))
  }

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

  /** normalize_text over randomized unicode: idempotent, agrees across
    * canonically-equivalent (composed vs decomposed) spellings, and the
    * output is hygienic — no stripped controls/zero-widths, no space
    * runs, no leading/trailing spaces. Atoms mix ASCII, strippable
    * codepoints (C0 controls, DEL, ZWSP/ZWJ/ZWNJ, BOM), kept whitespace
    * (tab/newline) and composed/decomposed accent pairs. */
  test("normalize_text: idempotent, NFC-stable, hygienic on random " +
      "unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    val strippable = Seq(1, 7, 0xb, 0x1f, 0x7f, 0x200b, 0x200c, 0x200d,
      0xfeff).map(cp => new String(Character.toChars(cp)))
    val accents = Seq("\u00e9", "e\u0301", "\u00c5", "A\u030a",
      "\u00f1", "n\u0303", "\u4e16", "\u754c")
    // the idempotence killer the kernel's strip-before-NFC order
    // exists for: a strippable BETWEEN a base letter and a combining
    // mark (NFC-first would leave it decomposed on the first pass and
    // compose it on the second)
    val mark = new String(Character.toChars(0x301))
    val patho = strippable.map(z => "e" + z + mark)
    val atom = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(Seq(" ", "  ", "\t", "\n") ++ strippable),
      Gen.oneOf(accents ++ patho))
    val strGen = Gen.listOf(atom).map(_.mkString)
    def norm(s: String): String =
      HashFuncs.normalizeText(UTF8String.fromString(s)).toString
    holds(forAll(strGen) { s =>
      val n = norm(s)
      val nfd = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFD)
      val hygienic =
        !n.exists(c => (c < ' ' && c != '\t' && c != '\n') ||
          strippable.exists(_.charAt(0) == c)) &&
        !n.contains("  ") && !n.startsWith(" ") && !n.endsWith(" ")
      norm(n) == n && norm(nfd) == n && hygienic
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

  /** The 100 TB rollup claim for the HLL sketch, as algebra: for ANY
    * random shard split of the data, per-shard register tables merged
    * by element-wise max equal the whole-data register table (split
    * invariance = associativity + commutativity of the max-merge over
    * every partition of the stream), the merge is idempotent (merging
    * a sketch with itself changes nothing), and the estimate computed
    * from the merged sketch equals the whole-data estimate. */
  test("Hll merge: shard-split invariance, idempotence, estimate equality") {
    val seedGen = Gen.choose(0L, Long.MaxValue)
    holds(forAll(seedGen) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(600)
      val nShards = 2 + rnd.nextInt(4)
      // duplicates + skew: values from a small-ish domain
      val rows = Seq.fill(n)((rnd.nextLong() % (1 + rnd.nextInt(2000)),
        rnd.nextInt(nShards)))
      val df = rows.toDF("v", "shard").withColumn("g", lit(1))
      val whole = Hll.registers(df, Seq("g"), "v")
      val sharded = Hll.registers(df, Seq("g", "shard"), "v")
      val merged = Hll.merge(sharded, Seq("g"))
      def regSet(d: org.apache.spark.sql.DataFrame) =
        d.select($"bucket", $"r").as[(Long, Long)].collect().toSet
      val splitInvariant = regSet(merged) == regSet(whole)
      val remerged = Hll.merge(merged.unionByName(merged), Seq("g"))
      val idempotent = regSet(remerged) == regSet(merged)
      def est(d: org.apache.spark.sql.DataFrame) =
        Hll.estimate(d, Seq("g")).select($"est_distinct")
          .as[Double].collect().toSeq
      splitInvariant && idempotent && est(merged) == est(whole)
    }, Parameters.default.withMinSuccessfulTests(5))
  }

  /** Label propagation on a disjoint union of cliques (size ≥ 3):
    * after round 1 every non-min member holds the clique min and the
    * min member holds the second-min; round 2's majority vote then
    * fixes EVERY member at the clique min (m−2 ≥ 1 of each node's
    * neighbors already vote min, beating any single dissenting label),
    * so by 4 rounds each clique must be exactly its min id — for ANY
    * random clique sizes and id assignment. Size-2 cliques are
    * excluded: a single edge is bipartite and oscillates by design
    * (the synchronous-update caveat the scaladoc documents). */
  test("labelPropagation fixes every >=3-clique at its min id") {
    val seedGen = Gen.choose(0L, Long.MaxValue)
    holds(forAll(seedGen) { seed =>
      val rnd = new scala.util.Random(seed)
      val sizes = Seq.fill(2 + rnd.nextInt(4))(3 + rnd.nextInt(4))
      val ids = rnd.shuffle((0L until 64L).toList).take(sizes.sum)
      val cliques = {
        var rest = ids
        sizes.map { m =>
          val (c, r) = rest.splitAt(m); rest = r; c
        }
      }
      val nodes = ids.toDF("id")
      val edges = cliques.flatMap(c =>
        for (a <- c; b <- c if a < b) yield (a, b)).toDF("src", "dst")
      val got = Graph.labelPropagation(nodes, edges, iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cliques.forall(c => c.forall(v => got(v) == c.min))
    }, Parameters.default.withMinSuccessfulTests(5))
  }

  /** Same algebra for the quantile histogram, whose merge is a SUM (so
    * idempotence is replaced by disjoint-shard additivity): any shard
    * split merges back to the whole-data histogram, two DIFFERENT
    * random splits of the same data merge to identical sketches, and
    * quantiles from the merged sketch equal whole-data quantiles. */
  test("QuantileHist merge: shard-split invariance and quantile equality") {
    val seedGen = Gen.choose(0L, Long.MaxValue)
    holds(forAll(seedGen) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(600)
      val vals = Seq.fill(n)(math.abs(rnd.nextLong()) %
        (1L << (1 + rnd.nextInt(30))))
      val s1 = vals.map(v => (v, rnd.nextInt(3)))
      val s2 = vals.map(v => (v, rnd.nextInt(5)))
      def hist(rows: Seq[(Long, Int)], byShard: Boolean) = {
        val df = rows.toDF("v", "shard").withColumn("g", lit(1))
        val keys = if (byShard) Seq("g", "shard") else Seq("g")
        QuantileHist.histogram(df, keys, "v")
      }
      def hSet(d: org.apache.spark.sql.DataFrame) =
        QuantileHist.merge(d, Seq("g"))
          .select($"bucket", $"cnt").as[(Long, Long)].collect().toSet
      val whole = hSet(hist(s1, byShard = false))
      val splitInvariant = hSet(hist(s1, byShard = true)) == whole
      val splitAgnostic = hSet(hist(s2, byShard = true)) == whole
      def qs(d: org.apache.spark.sql.DataFrame) =
        QuantileHist.quantiles(QuantileHist.merge(d, Seq("g")),
            Seq("g"), Seq(50, 90, 99))
          .select($"p", $"est").as[(Long, Long)].collect().toSet
      val quantEq = qs(hist(s1, byShard = true)) ==
        qs(hist(s1, byShard = false))
      splitInvariant && splitAgnostic && quantEq
    }, Parameters.default.withMinSuccessfulTests(5))
  }

  /** strip_markup over randomized nested/malformed markup, checked
    * against a BY-CONSTRUCTION oracle: every generated atom knows its
    * own visible text (tags/scripts/styles/comments contribute none,
    * entities their decoded char, math text itself), so the expected
    * output is the space-join of the visible parts — independent of
    * the kernel's regex chain. Atoms include nested-bracket malformed
    * tags (`<div <span>`), case-shifted script blocks whose CONTENT
    * contains `<`/`>`/fake tags, comments hiding tags, double-encoded
    * entities, and bare math `a < b` (the `<`-preservation invariant).
    * On the entity-free subset the output provably contains no residue
    * the tag pass could match and a second strip is a fixpoint (the
    * full chain is deliberately NOT idempotent: decoded `&lt;tag&gt;`
    * is text and must survive one pass but not two — asserted too). */
  test("strip_markup: by-construction oracle, no tag residue, " +
      "fixpoint on entity-free markup") {
    import org.apache.spark.unsafe.types.UTF8String
    def strip(s: String): String =
      HashFuncs.stripMarkup(UTF8String.fromString(s)).toString
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    // (raw markup, visible text) — entity-free atoms
    val plainAtom: Gen[(String, String)] = Gen.oneOf(
      word.map(w => (w, w)),
      Gen.zip(word, word).map { case (a, b) => (s"$a < $b", s"$a < $b") },
      Gen.zip(word, word).map { case (a, b) => (s"$a > $b", s"$a > $b") },
      Gen.zip(Gen.oneOf("b", "div", "SPAN", "a"), word).map {
        case (t, w) => (s"<$t class=\"x\">$w</$t>", w) },
      Gen.const(("<br/>", "")),
      Gen.const(("<div <span>", "")), // nested-bracket malformed tag
      Gen.zip(Gen.oneOf("script", "SCRIPT", "Script"), word).map {
        case (t, w) => (s"<$t type=\"t\">if(1<2){$w()}</$t>", "") },
      word.map(w => (s"<style>p { color: $w }</style>", "")),
      word.map(w => (s"<!-- $w <b>hidden</b> 1<2 -->", "")),
      Gen.const(("  \t\n ", "")))
    val entityAtom: Gen[(String, String)] = Gen.oneOf(
      ("&nbsp;", ""), ("&quot;", "\""), ("&apos;", "'"), ("&#39;", "'"),
      ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"),
      ("&amp;lt;", "&lt;"), // double-encoded: decodes to TEXT "&lt;"
      ("&lt;b&gt;", "<b>")) // decoded tag = text; survives ONE pass
    def expected(atoms: List[(String, String)]): String =
      atoms.map(_._2).mkString(" ")
        .replaceAll("[ \\t\\n\\r]+", " ").trim
    // full generator: by-construction oracle
    holds(forAll(Gen.listOf(Gen.frequency(
        4 -> plainAtom, 1 -> entityAtom))) { atoms =>
      strip(atoms.map(_._1).mkString(" ")) == expected(atoms)
    })
    // entity-free subset: no complete-tag/script/style/comment residue,
    // and strip is a fixpoint
    holds(forAll(Gen.listOf(plainAtom)) { atoms =>
      val out = strip(atoms.map(_._1).mkString(" "))
      val noResidue =
        !java.util.regex.Pattern.compile("<[a-zA-Z/!][^>]*>")
          .matcher(out).find() &&
        !out.toLowerCase.contains("<script") &&
        !out.toLowerCase.contains("<style") && !out.contains("<!--")
      noResidue && strip(out) == out
    })
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

  // --- FP-exactness of the AllPairs/PPJoin prefix path (r14 ADVICE /
  // r15 task: pin the CLASS, not just the two planted boundary pairs) -

  /** Reference for [[Dedup.minOverlapExpr]]: the definition itself,
    * min{ c ∈ [1, n] : fl(c/n) ≥ t }, scanned in JVM doubles (the same
    * IEEE arithmetic Spark codegen executes). */
  private def refMinOverlap(t: Double, n: Int): Long = {
    var c = math.max(1L, math.min(n.toLong,
      (BigDecimal(t) * n).setScale(0, BigDecimal.RoundingMode.CEILING)
        .toLong))
    while (c > 1 && (c - 1).toDouble / n.toDouble >= t) c -= 1
    while (c < n && c.toDouble / n.toDouble < t) c += 1
    c
  }

  /** Case generator: thresholds mix plain randoms, two-decimal values,
    * exact FP boundaries t = fl(c/n), and their one-ulp neighbors —
    * the shapes where the retired `ceil(t·n − 1e-9)` epsilon could
    * land on the wrong integer; n spans 1 .. Int.MaxValue (the old
    * nudge was only provably safe below ~4·10⁶). */
  private val overlapCaseGen: Gen[(Double, Int)] = for {
    n <- Gen.oneOf(Gen.choose(1, 100), Gen.choose(100, 1000000),
      Gen.choose(1000000, Int.MaxValue))
    c <- Gen.choose(1L, n.toLong).map(_.toInt)
    mode <- Gen.choose(0, 5)
    tRaw <- Gen.choose(1e-6, 1.0)
  } yield {
    val b = c.toDouble / n.toDouble
    val t = mode match {
      case 0 => tRaw
      case 1 => math.max(0.01, math.ceil(tRaw * 100) / 100.0)
      case 2 => b
      case 3 => math.nextUp(b)
      case 4 => math.nextDown(b)
      case _ => c.toDouble / math.max(c + 1, 2).toDouble
    }
    (math.min(1.0, math.max(1e-9, t)), n)
  }

  test("minOverlapExpr equals min{c : fl(c/n) >= t} — the exact bound " +
      "the prefix-safety argument needs — for random and adversarial " +
      "(t, n) up to n = Int.MaxValue") {
    // each scalacheck case evaluates a 120-row batch in ONE Spark job:
    // the production Column expression over a (t, n) DataFrame
    holds(forAll(Gen.listOfN(120, overlapCaseGen)) { cases =>
      val df = cases.toDF("t", "n")
        .withColumn("n", $"n".cast("int"))
        .withColumn("o", Dedup.minOverlapExpr($"t", $"n"))
      df.collect().forall { r =>
        val (t, n, o) = (r.getDouble(0), r.getInt(1), r.getLong(2))
        val ref = refMinOverlap(t, n)
        if (o != ref) {
          info(s"minOverlap mismatch: t=$t n=$n got=$o expect=$ref")
        }
        o == ref
      }
    }, Parameters.default.withMinSuccessfulTests(5))
  }

  test("length prune never rejects a pair the final FP predicate (or " +
      "the exact rational one) could emit, for random (t, a, b, c)") {
    val caseGen = for {
      a <- Gen.oneOf(Gen.choose(1, 50), Gen.choose(50, 100000),
        Gen.choose(100000, Int.MaxValue / 2))
      b <- Gen.oneOf(Gen.choose(1, 50), Gen.choose(50, 100000),
        Gen.choose(100000, Int.MaxValue / 2),
        Gen.const(a), Gen.choose(math.max(1, a - 3), a + 3))
      c <- Gen.choose(1, math.min(a, b))
      t <- Gen.oneOf(
        Gen.choose(1e-6, 1.0),
        Gen.choose(1, 99).map(_ / 100.0),
        Gen.const(math.min(a, b).toDouble / math.max(a, b).toDouble))
    } yield (t, a, b, c)
    holds(forAll(Gen.listOfN(200, caseGen)) { cases =>
      val df = cases.toDF("t", "a", "b", "c")
        .withColumn("passes",
          Dedup.lengthPrunePasses($"t", $"a".cast("long"),
            $"b".cast("long")))
      df.collect().forall { r =>
        val (t, a, b, c) = (r.getDouble(0), r.getInt(1), r.getInt(2),
          r.getInt(3))
        val passes = r.getBoolean(4)
        // the final FP predicate on the best-possible overlap c
        val fpEmits = c.toDouble / (a.toLong + b - c).toDouble >= t
        // the exact rational predicate (what a real-arithmetic engine
        // would emit): min/max >= t over BigDecimal
        val mn = math.min(a, b); val mx = math.max(a, b)
        val ratEmits = BigDecimal(mn) >= BigDecimal(t) * mx
        // prune may only drop pairs NEITHER predicate could emit
        (!fpEmits || passes) && (!ratEmits || passes)
      }
    }, Parameters.default.withMinSuccessfulTests(5))
  }

  test("jaccardPairsPrefix equals the exact inverted-index variant on " +
      "random corpora with a planted exact-boundary pair at a random " +
      "rational threshold") {
    // nested pair: A = c+2 distinct words (c trigrams, all contained
    // in B's prefix), B = A ++ m extra words (c+m trigrams) →
    // J(A, B) = c/(c+m) EXACTLY; threshold = fl(c/(c+m)) puts the
    // pair precisely on the FP boundary every filter stage must keep.
    val caseGen = for {
      c <- Gen.choose(3, 12)
      m <- Gen.choose(1, 6)
      nNoise <- Gen.choose(0, 4)
      salt <- Gen.choose(0, 1000000)
    } yield (c, m, nNoise, salt)
    holds(forAll(caseGen) { case (c, m, nNoise, salt) =>
      val aWords = (1 to c + 2).map(i => s"w$i")
      val bWords = aWords ++ (1 to m).map(i => s"x$i")
      val noise = (1 to nNoise).map { d =>
        (100L + d, (1 to 8).map(i => s"n${d}_${(salt + i) % 7}_$i")
          .mkString(" "))
      }
      val corpus = (Seq(
        (1L, aWords.mkString(" ")),
        (2L, bWords.mkString(" "))) ++ noise)
        .toDF("doc_id", "text")
      val t = c.toDouble / (c + m).toDouble
      val prefix = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text",
        k = 3, threshold = t)
      val exact = Dedup.jaccardPairs(corpus, "doc_id", "text",
        k = 3, threshold = t)
      val pKeys = prefix.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val eKeys = exact.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pKeys == eKeys && pKeys.contains((1L, 2L))
    }, Parameters.default.withMinSuccessfulTests(8))
  }
}
