package graft.queries

import graft.Q
import graft.Q.t
import graft.io.{SampleSheet, Sesame}
import org.apache.spark.sql.functions._

/** Oracle rows for the IO-boundary units (SURVEY.md S2/S3/S5): the
  * sample-sheet filename grammars, the `[Data]`-block CSV reader, and
  * the SeSAMe SigDF fix-up. Each unit is a pure frame transform
  * (refactored that way in round 9 precisely so it could be gated
  * here); the inputs are either derived deterministically from the
  * driver's `part` table (replayed in the DuckDB oracle with the same
  * integer/string arithmetic) or a golden literal fixture (q153 — the
  * reader's input is raw CSV text, which has no table representation).
  */
object IoQ {

  /** S3 — the three IDAT filename grammars (reference
    * sample_sheet.py:76-142) over a path frame built from `part`:
    * grammar 1 (4 underscore parts with a GSM prefix), grammar 2
    * (exactly 3 parts), the `GSM…(Grn|Red).idat` fallback regex with
    * its greedy-group trailing-separator trim (exercised at name
    * lengths 0, 1 and >1), and non-matching names that must be
    * DROPPED (wrong part count, 4 parts without the GSM prefix, no
    * `.idat` suffix). The oracle replays the path construction and the
    * grammar — split, part-count dispatch, regex captures, trim — in
    * DuckDB (RE2 and java.util.regex agree on this pattern: greedy
    * `(.*)` then optional `.?`, verified on every branch). */
  val q152 = Q(
    "q152_sheet_infer",
    (s, d) => {
      import s.implicits._
      val k = $"p_partkey"
      val paths = Q.anchorKey(t(s, d, "part"), "p_partkey")
        .filter(k <= 160)
        .select(
          when(k % 4 === 0,
            concat(lit("idats/GSM"), (k + 1000).cast("string"), lit("_"),
              (k + 200).cast("string"), lit("_R0"),
              (k % 8 + 1).cast("string"), lit("C01_Grn.idat")))
          .when(k % 4 === 1,
            concat(lit("run2/"), (k + 200).cast("string"), lit("_R0"),
              (k % 8 + 1).cast("string"), lit("C02_Grn.idat")))
          .when(k % 4 === 2,
            // fallback grammar: empty name, 1-char name (kept as-is),
            // long name with the trailing-separator trim, and a Red file
            when(k % 16 === 2,
              concat(lit("gsm/GSM"), (k + 4000).cast("string"),
                lit("-Grn.idat")))
            .when(k % 16 === 6,
              concat(lit("gsm/GSM"), (k + 5000).cast("string"),
                lit(".aGrn.idat")))
            .when(k % 16 === 10,
              concat(lit("gsm/GSM"), (k + 6000).cast("string"), lit("-s"),
                k.cast("string"), lit("-x-Red.idat")))
            .otherwise(
              concat(lit("gsm/GSM"), (k + 2000).cast("string"), lit("-s"),
                k.cast("string"), lit("-x-Grn.idat"))))
          .otherwise(
            // none of the grammars: dropped by inferSheet
            when(k % 8 === 3, lit("notes/readme_file.txt"))
              .otherwise(concat(lit("batch_"), k.cast("string"),
                lit("_R01C01_Grn.idat"))))
          .as("path"))
      SampleSheet.inferSheet(paths, "path")
        .orderBy($"sample_id")
    },
    Some("""
      WITH base AS (
        SELECT k FROM (
          SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS k
          FROM part)
        WHERE k <= 160
      ), paths AS (
        SELECT CASE
          WHEN k % 4 = 0 THEN 'idats/GSM' || CAST(k + 1000 AS VARCHAR)
            || '_' || CAST(k + 200 AS VARCHAR) || '_R0'
            || CAST(k % 8 + 1 AS VARCHAR) || 'C01_Grn.idat'
          WHEN k % 4 = 1 THEN 'run2/' || CAST(k + 200 AS VARCHAR)
            || '_R0' || CAST(k % 8 + 1 AS VARCHAR) || 'C02_Grn.idat'
          WHEN k % 4 = 2 THEN CASE
            WHEN k % 16 = 2 THEN 'gsm/GSM' || CAST(k + 4000 AS VARCHAR)
              || '-Grn.idat'
            WHEN k % 16 = 6 THEN 'gsm/GSM' || CAST(k + 5000 AS VARCHAR)
              || '.aGrn.idat'
            WHEN k % 16 = 10 THEN 'gsm/GSM' || CAST(k + 6000 AS VARCHAR)
              || '-s' || CAST(k AS VARCHAR) || '-x-Red.idat'
            ELSE 'gsm/GSM' || CAST(k + 2000 AS VARCHAR)
              || '-s' || CAST(k AS VARCHAR) || '-x-Grn.idat' END
          ELSE CASE WHEN k % 8 = 3 THEN 'notes/readme_file.txt'
            ELSE 'batch_' || CAST(k AS VARCHAR) || '_R01C01_Grn.idat' END
          END AS path
        FROM base
      ), f AS (
        SELECT string_split(path, '/')[-1] AS fname FROM paths
      ), p AS (
        SELECT fname, string_split(fname, '_') AS parts,
               len(string_split(fname, '_')) AS np,
               regexp_matches(fname,
                 '(GSM\d+).(.*).?(Grn|Red)\.idat') AS fb,
               regexp_extract(fname,
                 '(GSM\d+).(.*).?(Grn|Red)\.idat', 1) AS fbid,
               regexp_extract(fname,
                 '(GSM\d+).(.*).?(Grn|Red)\.idat', 2) AS nm
        FROM f
      ), g AS (
        SELECT *, np = 4 AND parts[1] LIKE 'GSM%' AS g1, np = 3 AS g2,
               CASE WHEN len(nm) <= 1 THEN nm
                    ELSE substr(nm, 1, len(nm) - 1) END AS fbname
        FROM p
      )
      SELECT CASE WHEN g1 THEN parts[1]
                  WHEN g2 THEN parts[1] || '_' || parts[2]
                  ELSE fbid END AS sample_id,
             CASE WHEN g1 THEN parts[1]
                  WHEN g2 THEN parts[1] || '_' || parts[2]
                  ELSE fbname END AS sample_name,
             CASE WHEN g1 THEN parts[2] WHEN g2 THEN parts[1]
                  ELSE CAST(NULL AS VARCHAR) END AS sentrix_id,
             CASE WHEN g1 THEN parts[3] WHEN g2 THEN parts[2]
                  ELSE CAST(NULL AS VARCHAR) END AS sentrix_position
      FROM g WHERE g1 OR g2 OR fb
      ORDER BY sample_id"""))

  /** S2 — the `[Data]`-block sheet reader (sample_sheet.py:17-73) over a
    * golden literal fixture: an Illumina `[Header]` preamble that must
    * be skipped, CamelCase + spaced headers that must snake_case, the
    * SentrixBarcode_A/SentrixPosition_A renames, an RFC-4180 quoted cell
    * containing a comma and a doubled quote, and empty cells that must
    * surface as NULL. The input is raw CSV text (no table form), so the
    * oracle is the golden parsed relation itself — any drift in the
    * marker scan, rename table or quote handling flips the hash. */
  val q153 = Q(
    "q153_sheet_read",
    (s, _) => {
      import s.implicits._
      val lines = Vector(
        "[Header],,,,",
        "Investigator Name,Jane,,,",
        "Date,2024-01-01,,,",
        "[Data],,,,",
        "Sample_ID,SampleName,SentrixBarcode_A,SentrixPosition_A,Sample Group",
        "s1,\"Smith, John\",205001,R01C01,A",
        "s2,Plain,205002,R02C01,",
        "s3,\"He said \"\"hi\"\"\",205003,,B")
      SampleSheet.readLines(s, lines)
        .select($"sample_id", $"sample_name", $"sentrix_id",
          $"sentrix_position", $"sample_group")
        .orderBy($"sample_id")
    },
    Some("""
      SELECT sample_id, sample_name, sentrix_id, sentrix_position,
             sample_group
      FROM (VALUES
        ('s1', 'Smith, John', '205001', 'R01C01', 'A'),
        ('s2', 'Plain', '205002', 'R02C01', CAST(NULL AS VARCHAR)),
        ('s3', 'He said "hi"', '205003', CAST(NULL AS VARCHAR), 'B')
      ) AS t(sample_id, sample_name, sentrix_id, sentrix_position,
             sample_group)
      ORDER BY sample_id"""))

  /** S5 — the SigDF fix-up (samples.py:1949-1962) over a raw frame
    * derived from `part`: type-II green values must MOVE from UG to MG,
    * the type-II channel must be inferred from which cell is populated
    * (MG empty → R, UR empty → G), mask_info coalesces to '', and the
    * boolean `mask` column splits into mask rows (surfaced here as a
    * `masked` flag via a left join of the two returned frames). The
    * oracle replays the manifest join and every CASE in SQL. All
    * intensities are integer-valued floats — exact in both engines. */
  val q154 = Q(
    "q154_sesame_sigdf",
    (s, d) => {
      import s.implicits._
      val k = $"p_partkey"
      val base = Q.anchorKey(t(s, d, "part"), "p_partkey")
        .filter(k <= 200)
        .select(k.as("k"))
      val man = base.select(
        concat(lit("cg"), lpad($"k".cast("string"), 8, "0")).as("probe_id"),
        when($"k" % 3 === 0, "II").otherwise("I").as("inf_type"),
        when($"k" % 3 === 0, lit(null).cast("string"))
          .otherwise(when($"k" % 2 === 0, "G").otherwise("R"))
          .as("channel"),
        lit("cg").as("probe_type"),
        when($"k" % 7 === 0, "M_mapping")
          .otherwise(lit(null).cast("string")).as("mask_info"))
      val samples = Seq(("s1", 0), ("s2", 1)).toDF("sample_label", "si")
      val raw = base.crossJoin(samples).select(
        $"sample_label",
        concat(lit("cg"), lpad($"k".cast("string"), 8, "0")).as("probe_id"),
        // type I: all four cells; type II green: value arrives in UG
        // (MG/UR empty); type II red: value in MR/UR (MG/UG empty)
        when($"k" % 3 === 0, lit(null).cast("float"))
          .otherwise(($"k" * 2 + $"si").cast("float")).as("MG"),
        ($"k" * 3 + $"si").cast("float").as("MR"),
        when($"k" % 3 === 0 && $"k" % 2 === 0, ($"k" * 11 + $"si").cast("float"))
          .when($"k" % 3 === 0, lit(null).cast("float"))
          .otherwise(($"k" * 5 + $"si").cast("float")).as("UG"),
        when($"k" % 3 === 0 && $"k" % 2 === 0, lit(null).cast("float"))
          .otherwise(($"k" * 7 + $"si").cast("float")).as("UR"),
        (($"k" + $"si") % 5 === 0).as("mask"))
      val (signal, masks) = Sesame.sigDfTransform(raw, man)
      signal
        .join(masks.select($"sample_label", $"probe_id",
          lit(true).as("masked")), Seq("sample_label", "probe_id"), "left")
        .select($"sample_label", $"probe_id", $"inf_type", $"channel",
          $"probe_type", $"mask_info", $"meth_g", $"meth_r",
          $"unmeth_g", $"unmeth_r",
          coalesce($"masked", lit(false)).as("masked"))
        .orderBy($"sample_label", $"probe_id")
    },
    Some("""
      WITH base AS (
        SELECT k FROM (
          SELECT p_partkey - (SELECT min(p_partkey) FROM part) AS k
          FROM part)
        WHERE k <= 200
      ), man AS (
        SELECT 'cg' || lpad(CAST(k AS VARCHAR), 8, '0') AS probe_id,
               CASE WHEN k % 3 = 0 THEN 'II' ELSE 'I' END AS inf_type,
               CASE WHEN k % 3 = 0 THEN CAST(NULL AS VARCHAR)
                    WHEN k % 2 = 0 THEN 'G' ELSE 'R' END AS channel,
               'cg' AS probe_type,
               CASE WHEN k % 7 = 0 THEN 'M_mapping'
                    ELSE CAST(NULL AS VARCHAR) END AS mask_info
        FROM base
      ), raw AS (
        SELECT sample_label, si,
               'cg' || lpad(CAST(k AS VARCHAR), 8, '0') AS probe_id,
               CASE WHEN k % 3 = 0 THEN CAST(NULL AS FLOAT)
                    ELSE CAST(k * 2 + si AS FLOAT) END AS mg,
               CAST(k * 3 + si AS FLOAT) AS mr,
               CASE WHEN k % 3 = 0 AND k % 2 = 0
                      THEN CAST(k * 11 + si AS FLOAT)
                    WHEN k % 3 = 0 THEN CAST(NULL AS FLOAT)
                    ELSE CAST(k * 5 + si AS FLOAT) END AS ug,
               CASE WHEN k % 3 = 0 AND k % 2 = 0 THEN CAST(NULL AS FLOAT)
                    ELSE CAST(k * 7 + si AS FLOAT) END AS ur,
               (k + si) % 5 = 0 AS mask
        FROM base, (VALUES ('s1', 0), ('s2', 1)) s(sample_label, si)
      ), joined AS (
        SELECT r.sample_label, r.probe_id, m.inf_type, m.probe_type,
               CASE WHEN m.inf_type = 'II' THEN r.ug ELSE r.mg END AS mg2,
               r.mr,
               CASE WHEN m.inf_type = 'II' THEN CAST(NULL AS FLOAT)
                    ELSE r.ug END AS ug2,
               r.ur, r.mask,
               CASE WHEN m.inf_type = 'II'
                      AND (CASE WHEN m.inf_type = 'II' THEN r.ug
                           ELSE r.mg END) IS NULL THEN 'R'
                    WHEN m.inf_type = 'II' AND r.ur IS NULL THEN 'G'
                    ELSE m.channel END AS channel,
               coalesce(m.mask_info, '') AS mask_info
        FROM raw r JOIN man m USING (probe_id)
      )
      SELECT sample_label, probe_id, inf_type, channel, probe_type,
             mask_info, mg2 AS meth_g, mr AS meth_r, ug2 AS unmeth_g,
             ur AS unmeth_r, mask AS masked
      FROM joined
      ORDER BY sample_label, probe_id"""))

  val all: Seq[Q] = Seq(q152, q153, q154)
}
