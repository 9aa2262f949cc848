package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Genome-interval operators (SURVEY.md §2.4 J4-J8, §2.7 W5) — the Spark
  * re-expression of the reference's pyranges calls (`join_overlaps`
  * cnv.py:184, `count_overlaps` cnv.py:281, `subtract_overlaps` cnv.py:169,
  * `cluster_overlaps` cnv.py:302, `tile_genome` cnv.py:167-168).
  *
  * Intervals are half-open `[start, end)` rows with a `chrom` partition
  * column, matching the reference's coordinate convention.
  *
  * Scale design: a naive overlap join is a non-equi join that Catalyst
  * plans as a broadcast-nested-loop — quadratic and unusable at 100 TB.
  * Every operator here instead derives an equi key first:
  *   - fixed-size binning (`withBins`): each interval explodes to the
  *     `floor(start/bin)..floor((end-1)/bin)` bucket ids, so the overlap
  *     join becomes an equi join on `(chrom, bin)` + a residual range
  *     predicate — a plain shuffled hash/sort-merge join that partitions
  *     evenly (AQE handles chromosome skew).
  *   - clustering is a single window pass per chromosome (sort once,
  *     running max of `end`), never a self-join.
  */
object Intervals {

  /** Explode each interval row to one row per overlapped fixed-size bin,
    * adding `bin` (bucket ordinal) — the equi-key for overlap joins. */
  def withBins(df: DataFrame, binSize: Long,
      chrom: String = "chrom", start: String = "start",
      end: String = "end"): DataFrame =
    df.withColumn("bin",
      explode(sequence(expr(s"$start div $binSize"),
        expr(s"($end - 1) div $binSize"))))

  /** J8: `tile_genome` — fixed-size tiles covering [0, seqLength) per
    * chromosome from a (chrom, seq_length) table. Pure generator: explode
    * of a sequence, no shuffle. */
  def tileGenome(seqLengths: DataFrame, tileSize: Long): DataFrame =
    seqLengths.select(
      col("chrom"), col("seq_length"),
      explode(sequence(lit(0L), col("seq_length") - 1, lit(tileSize)))
        .as("start"))
      .withColumn("end", least(col("start") + tileSize, col("seq_length")))
      .drop("seq_length")

  /** J4: interval overlap join. Both sides are binned to the same grid,
    * equi-joined on (chrom, bin), then filtered on the true overlap
    * predicate; `dropDuplicates` removes the multi-bin double matches.
    * `leftKeys` must uniquely identify a left row (used for dedup). */
  def overlapJoin(left: DataFrame, right: DataFrame, binSize: Long,
      leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    val l = withBins(left, binSize).withColumnsRenamed(
      Map("start" -> "l_start", "end" -> "l_end"))
    val r = withBins(right, binSize).withColumnsRenamed(
      Map("start" -> "r_start", "end" -> "r_end"))
    l.join(r, Seq("chrom", "bin"))
      .filter(col("l_start") < col("r_end") && col("l_end") > col("r_start"))
      .dropDuplicates("chrom" +: (leftKeys ++ rightKeys))
  }

  /** J5: `count_overlaps` — number of right intervals overlapping each
    * left interval. Implemented as overlapJoin + groupBy on the left key:
    * one equi-shuffle, partial counts map-side. */
  def countOverlaps(left: DataFrame, right: DataFrame, binSize: Long,
      leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame =
    overlapJoin(left, right, binSize, leftKeys, rightKeys)
      .groupBy("chrom", leftKeys: _*)
      .agg(first(col("l_start")).as("start"), first(col("l_end")).as("end"),
        count(lit(1)).as("n_overlaps"))

  /** J6: `subtract_overlaps` — cut the right intervals out of the left
    * ones (the reference's tiles − assembly-gaps, cnv.py:169).
    * Per left interval: collect overlapping right intervals, sort, walk the
    * gaps with a higher-order `aggregate` expression — no UDF, no window
    * over exploded fragments. Left rows with no overlap pass through. */
  def subtractOverlaps(left: DataFrame, right: DataFrame, binSize: Long,
      leftKeys: Seq[String]): DataFrame = {
    // Merge overlapping right intervals FIRST (complement-of-union is
    // invariant under merging): dense cut sets collapse to disjoint
    // spans, shrinking the join fan-out by orders of magnitude — the
    // difference between O(tiles × overlapping-cuts) and
    // O(tiles × disjoint-spans) at genome scale.
    val mergedRight = clusterOverlaps(
      right.select(col("chrom"), col("start"), col("end")), 0L,
      Seq(col("start")))
      .groupBy("chrom", "cluster_id")
      .agg(min("start").as("start"), max("end").as("end"))
      .drop("cluster_id")
    val l = withBins(left, binSize)
    val r = withBins(mergedRight, binSize).select(
      col("chrom"), col("bin"),
      col("start").as("r_start"), col("end").as("r_end"))
    // Null out bin-mates that don't truly overlap (instead of filtering the
    // row — a left interval must survive with zero cuts, not disappear),
    // dedup multi-bin double matches, then walk each interval's cuts with
    // a WINDOW running-max cursor (codegen'd; the earlier array-fold
    // variant was ~5× slower, interpreted ArrayAggregate):
    //   - a fragment opens at the running max of previous cut-ends
    //     (≥ start, every cut overlaps) and closes at the next cut start;
    //   - a final fragment survives after the last cut;
    //   - unmatched rows (null cut) yield the whole [start, end).
    // Duplicate cuts (multi-bin double matches) need NO dedup: a
    // duplicate's cursor already covers its start, so it emits nothing —
    // saving a whole shuffle. All windows share one exchange (same
    // partition key), so the complete walk costs: equi-join + ONE window
    // shuffle + union.
    val keyCols = col("chrom") +: leftKeys.map(col)
    val joined = l.join(r, Seq("chrom", "bin"), "left")
      .withColumn("cs",
        when(col("start") < col("r_end") && col("end") > col("r_start"),
          col("r_start")))
      .withColumn("ce",
        when(col("cs").isNotNull, col("r_end")))
    val w = Window.partitionBy(keyCols :+ col("start") :+ col("end"): _*)
      .orderBy(col("cs"), col("ce"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // Each joined row emits 0-2 fragments in ONE projection (a mid
    // fragment before its cut, plus — on the partition's last row — the
    // final fragment after the last cut). Emitting both kinds from a
    // single explode keeps the join+window subtree evaluated once; the
    // earlier mids/fins union recomputed it twice.
    joined
      .withColumn("cursor",
        greatest(coalesce(max(col("ce")).over(wPrev), col("start")),
          col("start")))
      .withColumn("max_ce", max(col("ce")).over(wAll))
      .withColumn("is_last", row_number().over(w) === count(lit(1)).over(wAll))
      .withColumn("fin_start",
        greatest(coalesce(col("max_ce"), col("start")), col("start")))
      .select(keyCols :+ explode(expr(
        """filter(array(
             IF(cs IS NOT NULL AND cs > cursor,
                named_struct('fs', cursor, 'fe', cs), NULL),
             IF(is_last AND fin_start < `end`,
                named_struct('fs', fin_start, 'fe', `end`), NULL)),
           x -> x IS NOT NULL)""")).as("f"): _*)
      .select(keyCols :+ col("f.fs").as("frag_start") :+
        col("f.fe").as("frag_end"): _*)
  }

  /** J7/W5: `cluster_overlaps` — assign a cluster id to chains of
    * overlapping/adjacent intervals (slack = max allowed gap). One window
    * pass: running max of `end` over (chrom) ordered by (start, end),
    * new-cluster flag where start exceeds it + slack, running sum → id.
    * Requires `orderCols` to make ties deterministic. */
  def clusterOverlaps(df: DataFrame, slack: Long,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("chrom"))
      .orderBy(col("start") +: col("end") +: orderCols: _*)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("max_prev_end", max(col("end")).over(wPrev))
      .withColumn("new_cluster",
        when(col("max_prev_end").isNull ||
          col("start") > col("max_prev_end") + slack, 1L).otherwise(0L))
      .withColumn("cluster_id", sum(col("new_cluster")).over(wRun))
      .drop("max_prev_end", "new_cluster")
  }
}
