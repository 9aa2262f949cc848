package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sample-sheet IO (SURVEY.md S2/S3; reference
  * pylluminator/sample_sheet.py:17-142): CSV read with Illumina `[Data]`
  * header-block skip + snake_case renames, and sheet inference from IDAT
  * filenames (the reference's three filename grammars).
  */
object SampleSheet {

  /** Camel→snake-case (reference utils.py:68-84). */
  def toSnakeCase(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[\\s\\-]+", "_").toLowerCase

  /** S9 — write a sheet back to a single CSV file (sample_sheet.py:139).
    * Driver-side by design: sheets are KB-sized metadata, and the
    * reference emits one plain CSV (a distributed write would shard it).
    * Minimal RFC-4180 quoting; nulls become empty cells. */
  def write(sheet: DataFrame, path: String): Unit = {
    def cell(v: Any): String = {
      val s = Option(v).map(_.toString).getOrElse("")
      if (s.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val cols = sheet.columns
    val pw = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try {
      pw.println(cols.map(cell).mkString(","))
      sheet.collect().foreach { r =>
        pw.println(cols.indices.map(i => cell(r.get(i))).mkString(","))
      }
    } finally pw.close()
  }

  /** S2 — read a sample-sheet CSV. Skips an Illumina `[Data]` marker block
    * when present (sample_sheet.py:53-59), snake_cases headers, applies
    * the sentrix renames (sample_sheet.py:61-63), requires `sample_id`. */
  def read(spark: SparkSession, path: String,
      delimiter: String = ","): DataFrame =
    readLines(spark,
      scala.util.Using.resource(scala.io.Source.fromFile(path))(
        _.getLines().toVector), delimiter)

  /** [[read]]'s core over in-memory lines — the unit the q153 golden
    * oracle gates without touching the filesystem. */
  def readLines(spark: SparkSession, lines: Seq[String],
      delimiter: String = ","): DataFrame = {
    // pre-scan for the [Data] marker line (driver-side; sheet files are tiny)
    val dataIdx = lines.indexWhere(_.split(delimiter.charAt(0))
      .headOption.exists(_.trim == "[Data]"))
    val content = if (dataIdx >= 0) lines.drop(dataIdx + 1) else lines
    import spark.implicits._
    val df = spark.read.option("header", "true")
      .option("delimiter", delimiter)
      .option("escape", "\"") // RFC-4180 doubled quotes, not backslash
      .csv(content.toDS())
    val renamed = df.columns.foldLeft(df) { (d, c) =>
      d.withColumnRenamed(c, toSnakeCase(c) match {
        case "sentrixposition_a" | "sentrix_position_a" => "sentrix_position"
        case "sentrixbarcode" | "sentrixbarcode_a" | "sentrix_barcode" |
            "sentrix_barcode_a" => "sentrix_id"
        case s => s
      })
    }
    require(renamed.columns.contains("sample_id"),
      s"Column sample_id not found in ${renamed.columns.mkString(",")}")
    renamed
  }

  /** S3 — infer a sheet from Grn idat filenames (sample_sheet.py:76-142):
    *   - GSMxxx_[sentrix]_[pos]_Grn.idat
    *   - [sentrix]_[pos]_Grn.idat
    *   - GSMxxx-anything-Grn.idat (fallback regex)
    * Returns rows (sample_id, sample_name, sentrix_id, sentrix_position).
    */
  def inferFromFilenames(spark: SparkSession,
      grnFiles: Seq[String]): DataFrame = {
    import spark.implicits._
    inferSheet(grnFiles.toDF("path"), "path")
  }

  /** The three filename grammars as ROW-LOCAL Column expressions over a
    * frame of paths — [[inferFromFilenames]]'s engine and the unit the
    * q152 oracle gates. Unmatched filenames are dropped (the reference
    * skips them). Grammar order mirrors sample_sheet.py:76-142:
    * 4 underscore parts with a GSM prefix, then exactly 3 parts, then
    * the `GSM…(Grn|Red).idat` fallback regex (whose greedy group keeps
    * the trailing separator — trimmed when longer than one char, as the
    * reference does). Caveat vs the driver-side original: trailing
    * `_` separators would split differently (Java String.split drops
    * trailing empties) — impossible for `*.idat` names, which never end
    * with a separator. */
  def inferSheet(files: DataFrame, pathCol: String): DataFrame = {
    val re = "(GSM\\d+).(.*).?(Grn|Red)\\.idat"
    val fname = element_at(split(col(pathCol), "/"), -1)
    val parts = split(fname, "_")
    val p0 = element_at(parts, 1)
    val p1 = element_at(parts, 2)
    val p2 = element_at(parts, 3)
    val g1 = size(parts) === 4 && p0.startsWith("GSM")
    val g2 = size(parts) === 3
    val fb = regexp_like(fname, lit(re))
    val fbId = regexp_extract(fname, re, 1)
    val nm = regexp_extract(fname, re, 2)
    val fbName = when(length(nm) <= 1, nm)
      .otherwise(nm.substr(lit(1), length(nm) - 1))
    val nullS = lit(null).cast("string")
    files
      .filter(g1 || g2 || fb)
      .select(
        when(g1, p0).when(g2, concat(p0, lit("_"), p1))
          .otherwise(fbId).as("sample_id"),
        when(g1, p0).when(g2, concat(p0, lit("_"), p1))
          .otherwise(fbName).as("sample_name"),
        when(g1, p1).when(g2, p0).otherwise(nullS).as("sentrix_id"),
        when(g1, p2).when(g2, p1).otherwise(nullS)
          .as("sentrix_position"))
  }

  /** S6 — match idat files to sheet rows: each sample needs a Grn and Red
    * file whose name contains the sample_id or sentrix id_position
    * (samples.py:1776-1787). Returns (sample_label, channel, path). */
  def matchIdatFiles(sheet: Seq[Map[String, String]],
      files: Seq[String], labelCol: String = "sample_id")
      : Seq[(String, String, String)] =
    sheet.flatMap { row =>
      val label = row(labelCol)
      val keys = Seq(Some(row.getOrElse("sample_id", "")),
        for {
          id <- row.get("sentrix_id"); pos <- row.get("sentrix_position")
        } yield s"${id}_$pos").flatten.filter(_.nonEmpty)
      Seq("Grn" -> "G", "Red" -> "R").flatMap { case (tag, ch) =>
        files.find(f => keys.exists(k => f.contains(k)) && f.contains(tag))
          .map(f => (label, ch, f))
      }
    }
}
