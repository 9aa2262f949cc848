package graft.queries

import graft.Q
import graft.Q.t
import graft.operators.Intervals
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval/range operators (SURVEY.md J4-J8, W5) exercised on synthetic
  * intervals derived deterministically from the `events` table:
  * chrom = event_type, start = floor(value*100), end = start + f(event_id).
  * Both engines derive the same integers from the same parquet doubles, so
  * results hash-match exactly (no float aggregation anywhere).
  */
object IntervalQ {

  private def intervals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "events").select(
      $"event_id",
      $"event_type".as("chrom"),
      floor($"value" * 100).cast("long").as("start"))
      .withColumn("end", $"start" + ($"event_id" % 200) + lit(1L))
  }

  private val ivSql =
    """SELECT event_id, event_type AS chrom,
              CAST(floor(value * 100) AS BIGINT) AS s,
              CAST(floor(value * 100) AS BIGINT) + (event_id % 200) + 1 AS e
       FROM events"""

  /** J5+J8: bin the domain into fixed tiles and count interval overlaps
    * per (chrom, tile). The Spark plan never does a non-equi join: each
    * interval explodes directly to its overlapped tile ordinals (the
    * binned-equi-key rewrite of Intervals.withBins), then one partial-agg
    * shuffle. Tiles with zero overlaps are absent (inner semantics). */
  val q25 = Q(
    "q25_tile_count_overlaps",
    (s, d) => {
      import s.implicits._
      Intervals.withBins(intervals(s, d), 1000L)
        .groupBy($"chrom", ($"bin" * 1000L).as("tile_start"))
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy($"chrom", $"tile_start")
    },
    Some(s"""
      WITH iv AS ($ivSql),
      hits AS (
        SELECT chrom,
               unnest(generate_series(s // 1000, (e - 1) // 1000)) AS bin
        FROM iv
      )
      SELECT chrom, bin * 1000 AS tile_start, count(*) AS n_overlaps
      FROM hits
      GROUP BY chrom, bin
      ORDER BY chrom, tile_start"""))

  /** J7/W5: cluster overlapping intervals per chrom (slack 0) and
    * summarize each cluster — the reference's adjacent-bin merge
    * (cnv.py:302-313). Single window pass, no self-join. */
  val q26 = Q(
    "q26_interval_cluster",
    (s, d) => {
      import s.implicits._
      Intervals.clusterOverlaps(intervals(s, d), 0L, Seq($"event_id"))
        .groupBy($"chrom", $"cluster_id")
        .agg(min($"start").as("c_start"), max($"end").as("c_end"),
          count(lit(1)).as("n_members"))
        .orderBy($"chrom", $"cluster_id")
    },
    Some(s"""
      WITH iv AS ($ivSql),
      flagged AS (
        SELECT chrom, s, e,
               CASE WHEN max(e) OVER (PARTITION BY chrom ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                 OR s > max(e) OVER (PARTITION BY chrom ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 0
                 THEN 1 ELSE 0 END AS new_cluster,
               event_id
        FROM iv
      ), clustered AS (
        SELECT chrom, s, e,
               sum(new_cluster) OVER (PARTITION BY chrom ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_id
        FROM flagged
      )
      SELECT chrom, CAST(cluster_id AS BIGINT) AS cluster_id,
             min(s) AS c_start, max(e) AS c_end, count(*) AS n_members
      FROM clustered
      GROUP BY chrom, cluster_id
      ORDER BY chrom, cluster_id"""))

  /** J4: full overlap join between two interval sets (events-derived
    * intervals × a deterministic probe set), via the binned equi-join.
    * Output: per left interval the count and span of matched probes. */
  val q27 = Q(
    "q27_overlap_join",
    (s, d) => {
      import s.implicits._
      val probes = t(s, d, "events")
        .filter($"event_id" % 7 === 0)
        .select($"event_id".as("probe_id"), $"event_type".as("chrom"),
          (floor($"value" * 90).cast("long") + 5L).as("start"))
        .withColumn("end", $"start" + 150L)
      val iv = intervals(s, d).filter($"event_id" % 3 === 0)
      Intervals.overlapJoin(iv, probes, 1000L,
        Seq("event_id"), Seq("probe_id"))
        .groupBy($"chrom", $"event_id")
        .agg(count(lit(1)).as("n_probes"),
          min($"r_start").as("first_probe_start"))
        .orderBy($"chrom", $"event_id")
    },
    Some(s"""
      WITH iv AS (SELECT * FROM ($ivSql) WHERE event_id % 3 = 0),
      probes AS (
        SELECT event_id AS probe_id, event_type AS chrom,
               CAST(floor(value * 90) AS BIGINT) + 5 AS ps,
               CAST(floor(value * 90) AS BIGINT) + 5 + 150 AS pe
        FROM events WHERE event_id % 7 = 0
      )
      SELECT iv.chrom, iv.event_id, count(*) AS n_probes,
             min(probes.ps) AS first_probe_start
      FROM iv JOIN probes
        ON iv.chrom = probes.chrom AND iv.s < probes.pe AND iv.e > probes.ps
      GROUP BY iv.chrom, iv.event_id
      ORDER BY iv.chrom, iv.event_id"""))

  /** J6: subtract_overlaps — cut gap intervals out of tiles (the
    * reference's tiles − assembly gaps, cnv.py:169). Gaps derived
    * deterministically; output surviving fragments. */
  val q28 = Q(
    "q28_subtract_overlaps",
    (s, d) => {
      import s.implicits._
      val tiles = intervals(s, d).filter($"event_id" % 11 === 0)
        .select($"event_id", $"chrom", $"start", $"end")
      val gaps = t(s, d, "events").filter($"event_id" % 5 === 0)
        .select($"event_type".as("chrom"),
          (floor($"value" * 95).cast("long")).as("start"))
        .withColumn("end", $"start" + 40L)
      Intervals.subtractOverlaps(tiles, gaps, 1000L, Seq("event_id"))
        .orderBy($"chrom", $"event_id", $"frag_start")
        .select($"chrom", $"event_id", $"frag_start", $"frag_end")
    },
    // Same running-cursor gap-walk, phrased with windows: a fragment opens
    // at the running max of previous cut-ends (≥ tile start, since every
    // joined cut overlaps) and closes at the next cut start; a final
    // fragment survives after the last cut. Unmatched tiles (NULL cut)
    // yield only the final [s, e) fragment.
    Some(s"""
      WITH tiles AS (SELECT event_id, chrom, s, e FROM ($ivSql)
                     WHERE event_id % 11 = 0),
      gaps AS (
        SELECT event_type AS chrom,
               CAST(floor(value * 95) AS BIGINT) AS gs,
               CAST(floor(value * 95) AS BIGINT) + 40 AS ge
        FROM events WHERE event_id % 5 = 0
      ),
      j AS (
        SELECT t.chrom, t.event_id, t.s, t.e, g.gs, g.ge
        FROM tiles t LEFT JOIN (SELECT DISTINCT * FROM gaps) g
          ON t.chrom = g.chrom AND t.s < g.ge AND t.e > g.gs
      ),
      w AS (
        SELECT chrom, event_id, s, e, gs, ge,
               coalesce(max(ge) OVER (PARTITION BY chrom, event_id
                 ORDER BY gs, ge
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s) AS cursor
        FROM j
      ),
      mid AS (
        SELECT chrom, event_id, cursor AS frag_start, gs AS frag_end
        FROM w WHERE gs IS NOT NULL AND gs > cursor
      ),
      fin AS (
        SELECT chrom, event_id,
               greatest(s, coalesce(max(ge), s)) AS frag_start,
               e AS frag_end
        FROM j GROUP BY chrom, event_id, s, e
        HAVING greatest(s, coalesce(max(ge), s)) < e
      )
      SELECT chrom, event_id, frag_start, frag_end FROM mid
      UNION ALL
      SELECT chrom, event_id, frag_start, frag_end FROM fin
      ORDER BY chrom, event_id, frag_start"""))

  val all: Seq[Q] = Seq(q25, q26, q27, q28)
}
