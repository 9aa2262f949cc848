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

  /** Bucketed persistence for probe-keyed analytics — the 100 TB
    * co-location path. `bucketBy(probe_id)` + in-bucket sort pays the
    * probe shuffle ONCE at write time; every later probe-keyed join or
    * aggregation between tables written with the SAME bucket count
    * reads co-located buckets and plans NO Exchange at all (asserted
    * by StoreSpec): the DMP/DMR/beta pipelines re-read signal and
    * betas by probe far more often than they write them, so the
    * amortization is immediate. Bucketed tables go through the session
    * catalog (`saveAsTable` with an explicit external path) because
    * bucket metadata lives in the table definition, not the files. */
  def saveBucketedByProbe(df: DataFrame, table: String, path: String,
      nBuckets: Int = 64): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "probe_id").sortBy("probe_id")
      .option("path", path).format("parquet").saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides in via the
    * catalog; plain `read.parquet` on the path would lose it). */
  def loadBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Z-ordered persistence (Delta/Iceberg `OPTIMIZE ZORDER BY` shape):
    * range-partition + sort by the Morton interleave of two filter
    * columns, so parquet row-group min/max zone maps become selective
    * for predicates on EITHER column — a point/box query reads a few
    * files instead of all of them (LayoutSpec measures the file-level
    * pruning against a linear layout). The interleave is the codegen
    * `zorder2` kernel; `bits` (≤ 32) sets the box [0, 2^bits) — input
    * bits above it are IGNORED (values alias mod 2^bits), so wider
    * domains must be pre-scaled into the box.
    * At 100 TB this is a one-off re-cluster job: one range shuffle,
    * then every later scan with a selective predicate on either
    * dimension prunes at the zone-map level. */
  def saveZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, bits: Int = 16, nFiles: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    require(bits >= 1 && bits <= 32,
      s"bits must be in [1,32], got $bits — values outside [0, 2^bits) " +
        "alias into the box (high bits ignored); pre-scale wider domains")
    val z = graft.functions.Expressions.zorder2(col(colA), col(colB), bits)
    df.withColumn("_zkey", z)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** OPTIMIZE-shape compaction plan (the Delta/Iceberg small-file
    * maintenance pass): greedy bin-packing of files into ~`targetBytes`
    * groups in `pathCol` order WITHOUT splitting files — a file lands in
    * the bin where its exclusive byte offset falls (`offset div target`),
    * so a bin can overshoot by at most one file, exactly the simple
    * greedy plan OPTIMIZE executes. The offset is the global exclusive
    * prefix sum ([[graft.operators.Ranks.withGlobalPrefixSum]]'s
    * zipWithIndex shape — ONE range shuffle at any listing size, never a
    * single-partition window over 100 TB of file metadata). Returns one
    * row per file: (pathCol, bytesCol, offset, bin). Rewriting the plan
    * is then one `repartitionByRange(bin)` write per table. */
  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(pathCol != "offset" && pathCol != "bin" &&
        bytesCol != "offset" && bytesCol != "bin",
      "compactionPlan emits 'offset' and 'bin' columns — rename the " +
        s"input columns first (got pathCol=$pathCol, bytesCol=$bytesCol)")
    // paths must be unique (true of any real file listing): ties in the
    // prefix-sum sort order would make per-file offsets nondeterministic
    graft.operators.Ranks.withGlobalPrefixSum(
        files.select(col(pathCol), col(bytesCol).cast("long").as(bytesCol)),
        Seq(col(pathCol)), bytesCol, "offset", exclusive = true)
      .withColumn("bin", org.apache.spark.sql.functions.expr(
        s"offset div $targetBytes"))
  }

  /** MERGE INTO semantics (the Delta/Iceberg upsert shape) as one
    * full-outer hash join: matched + delete-flag → row dropped, matched →
    * the WHOLE update row replaces the base row (per-column coalesce
    * would resurrect base values under legitimate update NULLs), not
    * matched on the base side → insert, not matched on the update side →
    * base row unchanged. At 100 TB this is the merge-on-read compaction
    * pass: one shuffle of base+updates on the key — and when the base is
    * bucketed by the key ([[saveBucketedByProbe]] shape) the join plans
    * with zero base-side Exchange. `updates` carries the base's columns
    * plus a boolean `deleteFlag`. */
  def mergeUpsert(base: DataFrame, updates: DataFrame, key: String,
      deleteFlag: String = "is_delete",
      checkDuplicates: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, not, when}
    require(updates.columns.contains(deleteFlag),
      s"updates must carry the $deleteFlag column")
    if (checkDuplicates) {
      // Delta/Iceberg MERGE INTO raises on multiple matching source
      // rows; a full-outer join would instead silently FAN OUT each
      // base row once per duplicate. Guard with one eager agg over the
      // updates side only (the delta — small next to the base; callers
      // composing lazily can opt out and own the precondition).
      val dup = updates.groupBy(col(key))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      require(dup.isEmpty, s"mergeUpsert: updates has ${dup.head.get(1)} " +
        s"rows for $key=${dup.head.get(0)}; MERGE semantics require one " +
        "source row per key — pre-aggregate the updates")
    }
    val dataCols = base.columns.filter(_ != key).toSeq
    val b = base.as("mb")
    val u = updates.as("mu")
    b.join(u, col(s"mb.$key") === col(s"mu.$key"), "full_outer")
      .filter(col(s"mu.$deleteFlag").isNull || not(col(s"mu.$deleteFlag")))
      .select(coalesce(col(s"mb.$key"), col(s"mu.$key")).as(key) +:
        dataCols.map(c => when(col(s"mu.$key").isNotNull, col(s"mu.$c"))
          .otherwise(col(s"mb.$c")).as(c)): _*)
  }
}
