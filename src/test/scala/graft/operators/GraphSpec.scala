package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank semantics under dangling nodes: sink mass is redistributed
  * uniformly each round (Page et al. 1999 §2.7 random-surfer restart),
  * so total mass is conserved up to integer-floor remainders instead of
  * decaying geometrically — the property a crawl graph (full of leaf
  * URLs) actually needs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank conserves total mass on a sink graph") {
    // 0 -> 1 -> 2 with 2 a sink; 3 isolated (also a sink)
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val out = Graph.pageRank(nodes, edges, iters = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    // without redistribution the sinks bleed ~85% of their mass per
    // round and total collapses toward n·base ≈ 0.15·Total; with it
    // only integer floors leak (a few units per node per round)
    assert(math.abs(total - Graph.Total) < 1000L * 12)
    // 2 sits at the end of the chain: more mass than the isolate
    assert(out(2L) > out(3L))
    assert(out(1L) > out(3L))
  }

  test("pageRank matches the hand-computed integer recurrence " +
      "with a sink") {
    // 0 -> 1; 1 is a sink. n = 2.
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(nodes, edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 2L
    val base = (15L * (Graph.Total / n)) / 100L
    var r0 = Graph.Total / n
    var r1 = Graph.Total / n
    (1 to 3).foreach { _ =>
      val share = r1 / n // sinkMass div n, sink set = {1}
      val n0 = base + (85L * (0L + share)) / 100L
      val n1 = base + (85L * (r0 / 1L + share)) / 100L
      r0 = n0; r1 = n1
    }
    assert(out(0L) == r0)
    assert(out(1L) == r1)
  }

  test("pageRank on a sink-free graph is unchanged by the sink path " +
      "and requires a non-empty node set") {
    // 2-cycle: closed form fixpoint is uniform Total/n
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val out = Graph.pageRank(nodes, edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = (15L * (Graph.Total / 2)) / 100L
    var r = Graph.Total / 2
    (1 to 4).foreach(_ => r = base + (85L * r) / 100L)
    assert(out(0L) == r && out(1L) == r)
    intercept[IllegalArgumentException] {
      Graph.pageRank(spark.range(0).toDF("id"),
        Seq.empty[(Long, Long)].toDF("src", "dst"), 1)
    }
  }

  /** The max-count/min-label synchronous update, hand-simulated: two
    * 4-cliques bridged by one edge stay SEPARATE communities (each
    * clique's internal majority outvotes the single bridge vote — the
    * property connected components lack), and edge-less isolates keep
    * their own label. Expected labels traced by hand through 4 rounds
    * (and cross-checked against the q164 oracle's row_number spelling
    * of the same rule). */
  test("labelPropagation separates bridged cliques, keeps isolates, " +
      "is partitioning-invariant") {
    val nodes = (0L to 9L).toDF("id")
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (4L, 7L), (5L, 6L), (5L, 7L), (6L, 7L),
      (3L, 4L)).toDF("src", "dst")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 4L, 8L -> 8L, 9L -> 9L)
    val out = Graph.labelPropagation(nodes, edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected)
    // synchronous updates have no visit-order artifact: any input
    // partitioning yields the identical labeling
    val out2 = Graph.labelPropagation(nodes.repartition(7),
      edges.repartition(5), iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == expected)
  }
}
