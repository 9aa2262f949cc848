package graft.streaming

import graft.core.SignalBuilder
import graft.io.Idat
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** SURVEY.md §2.12's noted extension (beyond reference parity): treat
  * arriving IDAT pairs as a stream and maintain the signal/betas tables
  * incrementally.
  *
  * Ingest is manifest-driven: scanners drop a text file per batch into
  * `manifestDir`, one `sample_label,channel,path` line per idat file.
  * The file stream picks up new manifests; `foreachBatch` decodes ONLY
  * the new files (distributed, Idat.read), builds their signal slice,
  * computes betas, and appends both to sample-partitioned parquet — an
  * idempotent-per-batch, incremental version of `read_samples` that
  * never recomputes already-ingested samples.
  */
object IncrementalIngest {

  /** Start the ingest stream. Appends `outDir/signal` and
    * `outDir/betas`, checkpointing in `outDir/_checkpoint`. */
  def start(spark: SparkSession, manifestDir: String, manifest: DataFrame,
      outDir: String, minBeads: Int = 1): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", "16")
      .text(manifestDir)
    lines.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val files = batch.collect().map(_.getString(0).trim)
          .filter(_.nonEmpty)
          .map { line =>
            val Array(sample, channel, path) = line.split(",", 3)
            (sample, channel, path)
          }.toSeq
        if (files.nonEmpty) {
          val idat = Idat.read(batch.sparkSession, files).toDF()
          val signal = SignalBuilder.build(idat, manifest, minBeads)
            .cache()
          signal.write.mode(SaveMode.Append)
            .partitionBy("sample_label").parquet(s"$outDir/signal")
          SignalBuilder.calculateBetas(signal)
            .write.mode(SaveMode.Append)
            .partitionBy("sample_label").parquet(s"$outDir/betas")
          signal.unpersist()
        }
        ()
      }
      .start()
  }

  def loadBetas(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/betas")
}
