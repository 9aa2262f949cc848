package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core data model of the methylation engine (SURVEY.md §1.4): the
  * reference's wide two-level-column pandas matrix
  * (pylluminator/samples.py:524-564) re-expressed as LONG-format fact
  * tables so `sample_label` is a first-class partition key and the engine
  * scales past 6 samples to thousands.
  */
object Schemas {

  /** One row per (sample, probe) — the signal fact table.
    * Type II probes have structural nulls in meth_r/unmeth_g
    * (reference samples.py:538-540, tests/test_read_samples.py:180-190).
    * `channel` is the manifest channel until `Prep.inferType1Channel`
    * rewrites it (samples.py:997-1002 — a plain withColumn here). */
  final case class SignalRow(
      sample_label: String,
      probe_id: String,
      inf_type: String, // "I" | "II"
      channel: String, // "G" | "R" | null (type II)
      probe_type: String, // cg | ch | snp | ctl
      mask_info: String,
      meth_g: Option[Float],
      meth_r: Option[Float],
      unmeth_g: Option[Float],
      unmeth_r: Option[Float],
      p_value: Option[Float])

  /** Raw decoded IDAT probe row (reference read_idat.py:324-382). */
  final case class IdatRow(
      sample_label: String,
      signal_channel: String, // "G" | "R" (which idat file)
      illumina_id: Int,
      mean_value: Float,
      std_dev: Float,
      n_beads: Short)

  /** Manifest row (reference annotations.py:260-292). */
  final case class ManifestRow(
      illumina_id: Int,
      probe_id: String,
      inf_type: String,
      channel: String,
      probe_type: String,
      address_a: Option[Int],
      address_b: Option[Int],
      chromosome: String,
      start: Long,
      end: Long,
      mask_info: String)

  /** Mask row: null sample_label = applies to all samples
    * (reference mask.py:8-44). */
  final case class MaskRow(
      mask_name: String,
      sample_label: String,
      probe_id: String)

  /** Betas long row. */
  final case class BetaRow(sample_label: String, probe_id: String,
      beta: Option[Float])

  // ---- Array types (annotations.py:104-125) + probe-count auto-detect
  // (annotations.py:360-397, thresholds verbatim). ----
  sealed abstract class ArrayType(val name: String, val isHuman: Boolean)
  object ArrayType {
    case object EpicV2 extends ArrayType("EPICv2", true)
    case object EpicPlus extends ArrayType("EPIC+", true)
    case object Epic extends ArrayType("EPIC", true)
    case object Hm450 extends ArrayType("450K", true)
    case object Msa extends ArrayType("MSA", true)
    case object Mm285 extends ArrayType("MM285", false)
    case object Hm27 extends ArrayType("27K", true)
    case object Mammal40 extends ArrayType("Mammal40", false)
  }

  /** Auto-detect array type from idat probe count
    * (annotations.py:360-397). Unknown → EpicV2 (latest human). */
  def detectArray(probeCount: Long): ArrayType = probeCount match {
    case n if n > 1070000 && n < 1200000 => ArrayType.EpicV2
    case n if n > 1053000 && n <= 1070000 => ArrayType.EpicPlus
    case n if n >= 1050000 && n <= 1053000 => ArrayType.Epic
    case n if n >= 622000 && n <= 623000 => ArrayType.Hm450
    case n if n >= 370000 && n <= 400000 => ArrayType.Msa
    case n if n >= 315000 && n <= 362000 => ArrayType.Mm285
    case n if n >= 54000 && n <= 56000 => ArrayType.Hm27
    case n if n >= 35000 && n <= 45000 => ArrayType.Mammal40
    case _ => ArrayType.EpicV2
  }

  /** Sesame recommended quality-mask name regexes per array type
    * (annotations.py:312-340). */
  def qualityMaskNames(a: ArrayType): String = a match {
    case ArrayType.EpicV2 | ArrayType.EpicPlus =>
      Seq("M_1baseSwitchSNPcommon_5pt", "M_2extBase_SNPcommon_5pt",
        "M_mapping", "M_nonuniq", "M_SNPcommon_5pt").mkString("|")
    case ArrayType.Epic | ArrayType.Hm450 =>
      Seq("mapping", "channel_switch", "snp5_GMAF1p", "extension",
        "sub30_copy").mkString("|")
    case ArrayType.Hm27 => "mask"
    case ArrayType.Mm285 => Seq("ref_issue", "nonunique", "design_issue")
      .mkString("|")
    case _ => ""
  }

  /** Non-unique (multi-mapping) mask names (annotations.py:312-318). */
  val nonUniqueMaskNames: String =
    "M_nonuniq|nonunique|sub35_copy|multi|design_issue"

  /** Normalization-control probe-id regexes per channel
    * (samples.py:894-899). */
  def normControlPatterns(a: ArrayType): (String, String) =
    if (a == ArrayType.Hm27) ("norm.green$", "norm.red$")
    else ("norm_c|norm_g$", "norm_a|norm_t$")
}

/** Chromosome-normalization column functions (SURVEY.md §2.10;
  * reference utils.py:261-354). */
object ChromNorm {

  /** Merge alternative contigs into their main chromosome:
    * `22_KI270928V1_ALT` → `22`; strips a leading `chr` prefix
    * (utils.py:261-305). */
  def mergeAltChromosomes(c: Column): Column =
    regexp_replace(regexp_replace(c, "^chr", ""), "^([0-9XYM]{1,2})_.*$", "$1")

  /** Chromosome → sortable number: 1-22 as-is, X=98, Y=99, M/other=100
    * (utils.py:308-354). */
  def chromosomeNumber(c: Column): Column = {
    val m = mergeAltChromosomes(c)
    when(upper(m) === "X", 98)
      .when(upper(m) === "Y", 99)
      .when(m.rlike("^[0-9]{1,2}$"), m.cast("int"))
      .otherwise(100)
  }
}
