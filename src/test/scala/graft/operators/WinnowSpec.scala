package graft.operators

import graft.SparkSpec
import graft.functions.HashFuncs
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  /** The direct per-window definition (Schleimer et al. §4): every
    * window of W consecutive hashes selects its rightmost minimum;
    * leading partial windows included (our documented convention). */
  private def directWinnow(h: Array[Long]): Set[Int] = {
    val sel = scala.collection.mutable.Set[Int]()
    for (j <- h.indices) {
      val lo = math.max(0, j - W + 1)
      val m = (lo to j).map(h).min
      sel += (lo to j).filter(p => h(p) == m).max
    }
    sel.toSet
  }

  private def grams(text: String): Array[Long] =
    HashFuncs.wordShingleHashesAt(UTF8String.fromString(text), K)
      .toLongArray()

  test("operator selection equals the direct per-window rightmost-min " +
      "definition on randomized word streams (ties included)") {
    val rnd = new scala.util.Random(7)
    // tiny vocabulary forces many hash ties, stressing the tie-break
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1 to 60).map { id =>
      val n = 1 + rnd.nextInt(40)
      (id.toLong, (1 to n).map(_ => vocab(rnd.nextInt(4))).mkString(" "))
    }
    val got = Dedup.winnowFingerprints(
        docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .select($"doc_id", $"pos").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val hs = grams(text)
      val want = if (hs.isEmpty) Set.empty[Int] else directWinnow(hs)
      assert(got.getOrElse(id, Set.empty[Int]) == want,
        s"doc $id: got ${got.getOrElse(id, Set.empty)} want $want")
    }
  }

  test("winnowing guarantee: documents sharing a >= w+k-1-word run " +
      "share at least one fingerprint") {
    val rnd = new scala.util.Random(11)
    def words(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(5000)}")
    val shared = words(W + K - 1).mkString(" ") // exactly the bound
    val a = (words(20) :+ shared).mkString(" ") + " " + words(15).mkString(" ")
    val b = (words(9) :+ shared).mkString(" ") + " " + words(30).mkString(" ")
    val fps = Dedup.winnowFingerprints(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", K, W)
    val pairs = Dedup.winnowPairs(fps, "doc_id", minShared = 1).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L)
  }

  test("fingerprint density is near the published 2/(w+1) expectation") {
    val rnd = new scala.util.Random(13)
    val text = (1 to 5000).map(_ => s"t${rnd.nextInt(100000)}").mkString(" ")
    val n = grams(text).length
    val kept = Dedup.winnowFingerprints(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", K, W)
      .count()
    val density = kept.toDouble / n
    val expect = 2.0 / (W + 1)
    assert(math.abs(density - expect) < 0.1,
      s"density $density vs expected $expect")
  }
}
