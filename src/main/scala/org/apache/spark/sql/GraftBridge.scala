package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed to expose custom Catalyst
  * Expressions as user-facing Columns in Spark 4 (Column moved to
  * sql-api and lost its public Expression constructor). */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Re-enter the DataFrame world from an `InternalRow` RDD produced by
    * `df.queryExecution.toRdd` (used by operators that must pin ONE
    * physical plan instance across multiple jobs — see
    * [[graft.operators.Ranks.withGlobalRank]]). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
