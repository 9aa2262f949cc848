package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mask table + application (SURVEY.md §2.3; reference mask.py:8-194,
  * samples.py:577-602). A mask is a named set of probe ids, scoped to one
  * sample (`sample_label` set) or all samples (`sample_label` null).
  * Masking NULLS the signal cells — it does not remove rows (M1).
  *
  * The mask table is a DataFrame [mask_name, sample_label, probe_id]; all
  * algebra (add/override, union-dedup, remove, count — mask.py:46-194) is
  * plain relational ops, and application is one left join.
  */
object Masks {

  val signalCells = Seq("meth_g", "meth_r", "unmeth_g", "unmeth_r", "p_value")

  def empty(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("mask_name", StringType),
        StructField("sample_label", StringType),
        StructField("probe_id", StringType))))
  }

  /** Add a mask, overriding any existing (mask_name, sample_label) scope
    * (mask.py:54-69: `masks[(name, label)] = mask` — a dict PUT, so the
    * same key replaces, INCLUDING the global scope where label is None).
    * The anti-join must therefore be null-safe on sample_label: a plain
    * equi-key never matches NULL = NULL and would silently keep the old
    * global set alongside the new one. */
  def addMask(masks: DataFrame, newMask: DataFrame): DataFrame = {
    val keyed = newMask.select("mask_name", "sample_label", "probe_id")
    val keys = keyed
      .select(col("mask_name").as("k_name"),
        col("sample_label").as("k_label"))
      .distinct()
    masks.join(keys,
      col("mask_name") === col("k_name") &&
        col("sample_label") <=> col("k_label"), "left_anti")
      .unionByName(keyed)
  }

  /** Remove masks by name and/or sample scope (mask.py:137-165). */
  def removeMask(masks: DataFrame, maskName: Option[String] = None,
      sampleLabel: Option[String] = None): DataFrame = {
    val byName: Column = maskName.map(col("mask_name") === _).getOrElse(lit(true))
    val byScope: Column = sampleLabel
      .map(s => col("sample_label").isNull || col("sample_label") === s)
      .getOrElse(lit(true))
    masks.filter(!(byName && byScope))
  }

  /** Distinct masked probes for a sample: global masks ∪ its own
    * (mask.py:94-102). */
  def maskedProbes(masks: DataFrame, sampleLabel: String): DataFrame =
    masks.filter(col("sample_label").isNull ||
      col("sample_label") === sampleLabel)
      .select("probe_id").distinct()

  /** Number of masked probes per sample scope (mask.py:117-131). */
  def maskCounts(masks: DataFrame): DataFrame =
    masks.groupBy("mask_name", "sample_label")
      .agg(countDistinct("probe_id").as("n_probes"))

  /** M1 — apply masks to the long signal table: null the signal cells of
    * (probe, sample) pairs hit by a global or sample-scoped mask
    * (samples.py:592-600). One left join on probe_id (mask side is the
    * small one — broadcast) + a scope predicate; no row removal. */
  def applyMask(signal: DataFrame, masks: DataFrame,
      maskNameFilter: Option[String] = None): DataFrame = {
    val mm = maskNameFilter.map(p => masks.filter(col("mask_name").rlike(p)))
      .getOrElse(masks)
    // Global and sample-scoped hits joined separately so each left join
    // stays 1:1 (distinct probe sets) — no row multiplication.
    val hit = signal.join(
      broadcast(mm.filter(col("sample_label").isNull)
        .select(col("probe_id")).distinct()
        .withColumn("g_hit", lit(true))), Seq("probe_id"), "left")
      .join(
        broadcast(mm.filter(col("sample_label").isNotNull)
          .select(col("probe_id"), col("sample_label"))
          .distinct().withColumn("s_hit", lit(true))),
        Seq("probe_id", "sample_label"), "left")
      .withColumn("is_masked",
        coalesce(col("g_hit"), lit(false)) || coalesce(col("s_hit"), lit(false)))
      .drop("g_hit", "s_hit")
    signalCells.foldLeft(hit) { (df, c) =>
      df.withColumn(c, when(col("is_masked"), lit(null).cast("float"))
        .otherwise(col(c)))
    }.drop("is_masked")
  }

  // ---- Mask builders (M2-M6) ----

  /** M2 — probes whose manifest mask_info matches a regex
    * (samples.py:739-768: `str.contains` regex search). */
  def maskByNames(signal: DataFrame, namePattern: String,
      maskName: String, sampleLabel: Option[String] = None): DataFrame =
    signal.filter(col("mask_info").rlike(namePattern))
      .select("probe_id").distinct()
      .select(lit(maskName).as("mask_name"),
        sampleLabel.map(lit(_)).getOrElse(lit(null)).cast("string")
          .as("sample_label"),
        col("probe_id"))

  /** M3 — Sesame quality / non-unique masks (annotations.py:312-340). */
  def maskQualityProbes(signal: DataFrame,
      arrayType: Schemas.ArrayType): DataFrame =
    maskByNames(signal, Schemas.qualityMaskNames(arrayType), "quality_probes")

  def maskNonUniqueProbes(signal: DataFrame): DataFrame =
    maskByNames(signal, Schemas.nonUniqueMaskNames, "non_unique_probes")

  /** M4 — semi-join masks against the manifest: XY chromosome, controls,
    * snps, non-cg (samples.py:787-831). `manifest` carries chromosome. */
  def maskXYProbes(manifest: DataFrame): DataFrame =
    manifest.filter(ChromNorm.mergeAltChromosomes(col("chromosome"))
      .isin("X", "Y"))
      .select("probe_id").distinct()
      .select(lit("xy_probes").as("mask_name"),
        lit(null).cast("string").as("sample_label"), col("probe_id"))

  def maskControlProbes(signal: DataFrame): DataFrame =
    signal.filter(col("probe_type") === "ctl")
      .select("probe_id").distinct()
      .select(lit("control_probes").as("mask_name"),
        lit(null).cast("string").as("sample_label"), col("probe_id"))

  def maskSnpProbes(signal: DataFrame): DataFrame =
    signal.filter(col("probe_type") === "snp")
      .select("probe_id").distinct()
      .select(lit("snp_probes").as("mask_name"),
        lit(null).cast("string").as("sample_label"), col("probe_id"))

  /** Non-CpG mask EXCLUDES controls (samples.py:827-831: the reference
    * masks them separately under 'Control' so normalization can still
    * reach them — callers mirror that by adding [[maskControlProbes]]
    * alongside, as `Samples.maskNonCgProbes` does). */
  def maskNonCgProbes(signal: DataFrame): DataFrame =
    signal.filter(!col("probe_type").isin("cg", "ctl"))
      .select("probe_id").distinct()
      .select(lit("non_cg_probes").as("mask_name"),
        lit(null).cast("string").as("sample_label"), col("probe_id"))

  /** M6 — pOOBAH mask: p_value ≥ threshold (samples.py:1603-1607). */
  def maskPoobah(signal: DataFrame, threshold: Double): DataFrame =
    signal.filter(col("p_value") >= threshold)
      .select(lit(s"poobah_$threshold").as("mask_name"),
        col("sample_label"), col("probe_id"))
}
