package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A3/A4 — merge replicate samples by a sheet column (reference
  * samples.py:604-664 + utils.py:516-564): signal cells and betas are
  * averaged per (probe, group); sheet rows are merged with the
  * type-dispatch aggregation (strings → ';'-joined sorted uniques,
  * numeric → mean, boolean → any).
  *
  * In the long schema this is a join of the group key + one groupBy —
  * the reference's per-sample column loop disappears.
  */
object MergeSamples {

  /** Merge the signal table: `groups` maps sample_label → group label. */
  def mergeSignal(signal: DataFrame, groups: DataFrame): DataFrame =
    signal.join(broadcast(groups), Seq("sample_label"))
      .groupBy(col("group_label").as("sample_label"), col("probe_id"),
        col("inf_type"), col("channel"), col("probe_type"))
      .agg(
        first(col("mask_info")).as("mask_info"),
        avg(col("meth_g")).cast("float").as("meth_g"),
        avg(col("meth_r")).cast("float").as("meth_r"),
        avg(col("unmeth_g")).cast("float").as("unmeth_g"),
        avg(col("unmeth_r")).cast("float").as("unmeth_r"),
        // p-values are dropped on merge (samples.py:608-610: reset)
        lit(null).cast("float").as("p_value"))

  /** Merge a betas long table the same way. */
  def mergeBetas(betas: DataFrame, groups: DataFrame): DataFrame =
    betas.join(broadcast(groups), Seq("sample_label"))
      .groupBy(col("group_label").as("sample_label"), col("probe_id"))
      .agg(avg(col("beta")).cast("float").as("beta"))

  /** A4 — merge sheet rows by group with type dispatch
    * (utils.py:533-564). */
  def mergeSheet(sheet: DataFrame, byColumn: String): DataFrame = {
    val aggs = sheet.schema.fields.filter(_.name != byColumn).map { f =>
      f.dataType match {
        case _: NumericType => avg(col(f.name)).as(f.name)
        case BooleanType => expr(s"bool_or(${f.name})").as(f.name)
        case _ => concat_ws(";",
          sort_array(collect_set(col(f.name)))).as(f.name)
      }
    }
    sheet.groupBy(col(byColumn)).agg(aggs.head, aggs.tail: _*)
  }
}
