package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S8 — persistence of a whole analysis state: the reference pickles the
  * Samples object (utils.py:144-183); the Spark engine writes one parquet
  * directory per table (signal, betas, masks, sheet) — columnar,
  * partition-pruned on read, and readable by any engine. Signal/betas are
  * partitioned by sample_label: per-sample reads touch one partition.
  */
object Store {

  def save(dir: String, signal: DataFrame, masks: DataFrame,
      betas: Option[DataFrame] = None,
      sheet: Option[DataFrame] = None): Unit = {
    signal.write.mode(SaveMode.Overwrite)
      .partitionBy("sample_label").parquet(s"$dir/signal")
    masks.write.mode(SaveMode.Overwrite).parquet(s"$dir/masks")
    betas.foreach(_.write.mode(SaveMode.Overwrite)
      .partitionBy("sample_label").parquet(s"$dir/betas"))
    sheet.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$dir/sheet"))
  }

  def loadSignal(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/signal")

  def loadMasks(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/masks")

  def loadBetas(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/betas")

  def loadSheet(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sheet")
}
