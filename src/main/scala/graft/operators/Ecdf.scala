package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed empirical-CDF lookup (reference: statsmodels ECDF used by
  * pOOBAH, samples.py:1591-1592): for each query row, F(v) = #(background
  * values ≤ v) / n_background within its group.
  *
  * Scale path: a SORT-MERGE instead of a broadcast lookup table. The
  * background and query rows are unioned and windowed per group ordered
  * by (value, is_background DESC) — a running sum of the background flag
  * IS the "≤ v" count (ties resolve right-continuously because equal
  * background values sort before the query row). One shuffle, partitions
  * bounded by per-group data. The collect-sort-broadcast alternative is
  * O(total background) DRIVER memory — ~3 GB/1000 samples for pOOBAH —
  * and caps at the JVM; this path has no driver state at all.
  */
object Ecdf {

  /** Attach `outCol` = F(valueCol) to `queries` (any schema containing
    * groupCols + valueCol). Null values and groups absent from
    * `background` yield null. `background` must expose groupCols +
    * valueCol.
    *
    * `bgSumCol`: optionally ALSO attach the group's total background
    * mass (sum of background values) to every query row. The sort-merge
    * already windows the union per group, so this is one more
    * whole-partition frame over the same exchange — callers that need
    * the group sum (pOOBAH's weak-background prior switch) get it for
    * free instead of re-aggregating the background subtree, which on a
    * derived background can mean recomputing its whole lineage. */
  def ecdfLookup(queries: DataFrame, background: DataFrame,
      groupCols: Seq[String], valueCol: String,
      outCol: String, bgSumCol: Option[String] = None): DataFrame = {
    // appended columns must not collide with the query schema: a
    // duplicate name would silently produce two identically-named
    // columns on the main branch but OVERWRITE on the null branch —
    // asymmetric schemas across the union
    for (c <- outCol +: bgSumCol.toSeq)
      require(!queries.columns.contains(c),
        s"ecdfLookup: output column '$c' collides with a query column")
    val gcols = groupCols.map(col)
    val payload = struct(queries.columns.map(col): _*)
    val q = queries.filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("double").as("_ec_v") :+
        lit(0L).as("_ec_bg") :+ payload.as("_ec_row"): _*)
    val qNull = queries.filter(col(valueCol).isNull)
    val b = background.filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("double").as("_ec_v") :+
        lit(1L).as("_ec_bg") :+ lit(null).cast(q.schema("_ec_row").dataType)
          .as("_ec_row"): _*)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col("_ec_v").asc, col("_ec_bg").desc)
    val wAll = Window.partitionBy(gcols: _*)
    // Pin the window exchange's parallelism: this stage is CPU-bound
    // (sort + three window frames per row) but byte-SMALL, so AQE's
    // byte-based partition coalescing (advisory 64 MB) squeezes it onto
    // a handful of tasks and serializes the sort — measured 7 s of an
    // 11 s pOOBAH run at sf0.1. An explicit keyed repartition carries
    // the same hash distribution the window needs (so no extra
    // exchange) and AQE leaves user-specified partition counts alone.
    val n = queries.sparkSession.sessionState.conf.numShufflePartitions
    val withF = q.unionByName(b).repartition(n, gcols: _*)
      .withColumn("_ec_le", sum(col("_ec_bg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_ec_n", sum(col("_ec_bg")).over(wAll))
    val withSum = bgSumCol.map(c => withF.withColumn(c,
        sum(when(col("_ec_bg") === 1, col("_ec_v"))).over(wAll)))
      .getOrElse(withF)
    val extra = bgSumCol.map(col(_)).toSeq
    val merged = withSum
      .filter(col("_ec_bg") === 0)
      .select(col("_ec_row.*") +:
        (col("_ec_le").cast("double") / nullif(col("_ec_n"), lit(0)))
          .as(outCol) +: extra: _*)
    merged.unionByName(
      bgSumCol.foldLeft(
        qNull.withColumn(outCol, lit(null).cast("double")))(
        (df, c) => df.withColumn(c, lit(null).cast("double"))))
  }
}
