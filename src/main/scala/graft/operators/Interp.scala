package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed piecewise-linear interpolation (np.interp semantics:
  * linear between knots, clamped to the end knots outside the range) —
  * the lookup the reference performs against per-sample broadcast knot
  * arrays (samples.py:1404,1418; stats.py:161-166).
  *
  * Same sort-merge shape as [[Ecdf]]: knot and query rows are unioned
  * and windowed per group ordered by (x, is_knot DESC); a running
  * last-non-null carries the bracketing knot at-or-below each query, a
  * forward-frame first-non-null carries the knot above, and the blend is
  * plain arithmetic. One shuffle, no driver state — the
  * collect-and-broadcast alternative is O(samples × knots) driver memory.
  *
  * A query equal to a knot x lands exactly on that knot's f (equal knots
  * sort before the query; the blend degenerates to f_lo), matching
  * np.interp's take-the-last-equal-knot behavior.
  */
object Interp {

  /** Attach `outCol` = np.interp(xCol over the group's knots) to
    * `queries` (any schema containing groupCols + xCol). `knots` must
    * expose groupCols + `xp` + `fp`. Null x or a group with no knots
    * yield null. */
  def interpLookup(queries: DataFrame, knots: DataFrame,
      groupCols: Seq[String], xCol: String, outCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val payload = struct(queries.columns.map(col): _*)
    val q = queries.filter(col(xCol).isNotNull)
      .select(gcols :+ col(xCol).cast("double").as("_ip_x") :+
        lit(null).cast("double").as("_ip_fp") :+
        lit(0L).as("_ip_k") :+ payload.as("_ip_row"): _*)
    val k = knots.filter(col("xp").isNotNull)
      .select(gcols :+ col("xp").cast("double").as("_ip_x") :+
        col("fp").cast("double").as("_ip_fp") :+
        lit(1L).as("_ip_k") :+ lit(null).cast(q.schema("_ip_row").dataType)
          .as("_ip_row"): _*)
    // knots (k=1) sort before queries at equal x; among equal-x knots the
    // LAST (largest fp — fp is monotone for sorted curves) wins the
    // running last-non-null, matching np.interp's binary search taking
    // the last tied knot.
    //
    // BOTH brackets are running last-non-null frames: the upper bracket
    // runs over the REVERSED ordering with the current row excluded —
    // "first knot after me (asc)" == "last knot before me (desc)". A
    // first(ignoreNulls) over a (1, unboundedFollowing) frame computes
    // the same thing but Spark's UnboundedFollowing frame re-scans to
    // the partition end for EVERY row — O(partition²), measured as a
    // multi-minute hang on the 22M-row dye-bias apply (each of its 12
    // sample×channel partitions holds ~2M rows).
    val wAsc = Window.partitionBy(gcols: _*)
      .orderBy(col("_ip_x").asc, col("_ip_k").desc, col("_ip_fp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(gcols: _*)
      .orderBy(col("_ip_x").desc, col("_ip_k").asc, col("_ip_fp").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val knotPoint = when(col("_ip_k") === 1,
      struct(col("_ip_x").as("x"), col("_ip_fp").as("f")))
    val merged = q.unionByName(k)
      .withColumn("_ip_lo", last(knotPoint, ignoreNulls = true).over(wAsc))
      .withColumn("_ip_hi", last(knotPoint, ignoreNulls = true).over(wDesc))
      .filter(col("_ip_k") === 0)
    val lo = col("_ip_lo"); val hi = col("_ip_hi")
    val blended = merged.withColumn(outCol,
      when(lo.isNull && hi.isNull, lit(null).cast("double"))
        .when(lo.isNull, hi.getField("f")) // below the first knot: clamp
        .when(hi.isNull, lo.getField("f")) // above the last knot: clamp
        .when(hi.getField("x") === lo.getField("x"), lo.getField("f"))
        .otherwise(lo.getField("f") +
          (hi.getField("f") - lo.getField("f")) *
            (col("_ip_x") - lo.getField("x")) /
            (hi.getField("x") - lo.getField("x"))))
      .select(col("_ip_row.*"), col(outCol))
    blended.unionByName(
      queries.filter(col(xCol).isNull)
        .withColumn(outCol, lit(null).cast("double")))
  }
}
