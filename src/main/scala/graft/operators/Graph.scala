package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation — the host/document ranking
  * pass (Page et al. 1999; Common-Crawl-style host ranking) that feeds
  * source-quality priors into corpus filtering.
  *
  * INTEGER-EXACT power iteration: ranks are scaled BIGINTs and every
  * step is integer arithmetic (`div`), so the fixpoint is bit-identical
  * regardless of partitioning, reduction order, or engine — the same
  * trick the splitmix samplers use to stay oracle-checkable. Floating
  * PageRank would accumulate order-dependent last-bit drift across
  * iterations and amplify it through the damping recurrence.
  *
  * Scale shape (per iteration): contributions shuffle once on `dst`
  * (map-side partial sums first — a hot page's in-edges combine before
  * the exchange), then a LEFT join back to the node set keyed the same
  * way. Lineage is truncated with localCheckpoint every few rounds so
  * the plan doesn't grow linearly with iterations (the classic
  * iterative-DataFrame failure: 20 nested joins blow up the optimizer
  * before the cluster sees a task). Dangling (zero-out-degree) nodes'
  * rank mass is REDISTRIBUTED uniformly each round — `sinkMass div n`
  * joins the damped term for every node — so total mass is conserved
  * up to integer-floor remainders instead of decaying geometrically on
  * sink-heavy graphs (a real crawl graph is full of leaf URLs). The
  * sink set is computed once (anti-join on out-degrees); graphs with
  * no sinks skip the per-iteration sink aggregation entirely.
  */
object Graph {

  /** Total scaled rank mass: ranks start at `Total div n` per node. */
  val Total = 1000000000000L // 10^12

  /** `iters` rounds of damped power iteration over `edges` (src, dst —
    * one row per edge; parallel edges count twice) on the node set
    * `nodes` (id). Out-degrees are computed once and joined in, so the
    * recurrence is
    *   r'(v) = (15·(Total div n)) div 100
    *           + (85 · (Σ_{u→v} (r(u) div outdeg(u))
    *                    + sinkMass div n)) div 100
    * with sinkMass = Σ r(u) over zero-out-degree u — every term
    * integer. Returns (id, rank). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 8,
      idCol: String = "id"): DataFrame = {
    require(iters >= 0 && iters <= 64, "iters out of range")
    val spark = nodes.sparkSession
    val n = nodes.count() // scalar boundary: node COUNT, not node data
    require(n > 0, "pageRank needs a non-empty node set")
    val base = (15L * (Total / n)) / 100L
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) pinned once — every iteration re-reads it
    val withDeg = edges.join(outDeg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Sink census, once: nodes that emit no edges. Their per-round rank
    // mass can't flow anywhere, so it is redistributed uniformly inside
    // the damped term. The presence check is a scalar boundary (one
    // COUNT on ids); a sink-free graph pays zero per-iteration cost.
    val sinks = nodes.select(col(idCol).as("id"))
      .join(outDeg.select(col("src").as("id")), Seq("id"), "left_anti")
    val hasSinks = sinks.limit(1).count() > 0
    var ranks = nodes.select(col(idCol).as("id"),
      lit(Total / n).as("rank"))
    var i = 0
    while (i < iters) {
      // `div`, not `/`: Spark's `/` on longs goes through double and a
      // hub with outdeg beyond ~1/ulp(rank) could floor off-by-one vs
      // DuckDB's exact BIGINT division; `div` is exact at any scale
      val contrib = withDeg
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val joined = nodes.select(col(idCol).as("id"))
        .join(contrib, col("id") === col("dst"), "left")
      val withS =
        if (hasSinks) {
          // per-node share of this round's sink mass (exact BIGINT
          // div); a 1-row frame broadcast into the update — no collect
          val sinkShare = ranks.join(sinks, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("_sm"))
            .select(expr(s"_sm div ${n}L").as("_sink_share"))
          joined.crossJoin(broadcast(sinkShare))
            .withColumn("s",
              coalesce(col("s"), lit(0L)) + col("_sink_share"))
        } else joined.withColumn("s", coalesce(col("s"), lit(0L)))
      ranks = withS.select(col("id"),
        (lit(base) + expr(s"(85 * s) div 100")).as("rank"))
      i += 1
      // truncate lineage: without this the logical plan nests one join
      // tree per iteration and analysis time, not the cluster, becomes
      // the bottleneck (eager localCheckpoint also breaks the
      // re-execution of all prior rounds on each action)
      if (i % 4 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    withDeg.unpersist()
    ranks
  }

  /** `iters` rounds of synchronous label propagation (Raghavan et al.
    * 2007) over the UNDIRECTED view of `edges` — community detection
    * for dedup-cluster splitting and topic grouping, one tier finer
    * than connected components (which merge everything reachable; LPA
    * keeps densely-linked groups apart across sparse bridges).
    *
    * DETERMINISTIC by construction, so the q164 oracle replays it
    * bit-for-bit: labels start at node id; each round every node takes
    * the label that is most frequent in its neighbor BAG (both edge
    * directions, parallel edges count per copy), ties broken by the
    * SMALLEST label; isolated nodes keep their label. The winner rule
    * is one `max(struct(count, -label))` aggregation — no RNG, no
    * visit order, no float.
    *
    * Scale shape (per iteration): labels join the symmetrized edge
    * list on `dst` (one hash shuffle), counts combine map-side on
    * (src, label), and the winner fold reduces on `src` alone — state
    * per round is one row per node plus one per live (node, label)
    * pair, never the neighborhood materialized as an array. Lineage is
    * truncated every 4 rounds like [[pageRank]]. Synchronous updates
    * (not the paper's sequential sweep) are the only semantics that
    * parallelize without a visit-order artifact; the standard
    * two-community oscillation risk on bipartite-ish graphs is why
    * `iters` is a hard cap rather than a convergence loop.
    *
    * Returns (id, community). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      iters: Int = 4, idCol: String = "id"): DataFrame = {
    require(iters >= 0 && iters <= 64, "iters out of range")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = nodes.select(col(idCol).as("id"))
    var labels = ids.select(col("id"), col("id").as("lab"))
    var i = 0
    while (i < iters) {
      val counts = und
        .join(labels.select(col("id").as("_nid"), col("lab")),
          col("dst") === col("_nid"))
        .groupBy(col("src"), col("lab"))
        .agg(count(lit(1)).as("c"))
      // argmax with min-label tie-break as one fold: max count wins,
      // then the NEGATED label inverts the order so max picks min
      val winners = counts
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("w"))
        .select(col("src").as("id"), (-col("w.nl")).as("wlab"))
      labels = labels.join(winners, Seq("id"), "left")
        .select(col("id"), coalesce(col("wlab"), col("lab")).as("lab"))
      i += 1
      if (i % 4 == 0 && i < iters) labels = labels.localCheckpoint()
    }
    und.unpersist()
    labels.select(col("id"), col("lab").as("community"))
  }
}
