package graft.queries

import graft.Q
import graft.Q.t
import org.apache.spark.sql.functions._

/** Second block of domain end-to-end oracles, converting the QC /
  * selector / ML-feed spec-only §2 rows into hash-gated rows: per-sample
  * intensity summary (A8), probe counts per chromosome (A6), top-N
  * most-variable probes (A10), scrub background correction (L11), the
  * selector family type1Green/meth/cg/subset (F4/F5/F6/F10) and the
  * imputed ML matrix assembly (R4). Same discipline as DomainQ: signal
  * frames derive from the driver tables with INTEGER-VALUED cells, so
  * sums/means/medians are exact rationals on both engines and the only
  * engine-visible rounding is the final float cast / round(·, 6).
  */
object DomainQ2 {

  import DomainQ.emit6

  /** The q65-shaped synthetic signal: integer-valued cells with
    * per-column NULL moduli (23 kills all four; 11/13/17/19 kill one
    * each), inf_type II on partkey%3==0, channel G on partkey%2==0. */
  private def sigA(s: org.apache.spark.sql.SparkSession, d: String,
      withProbeType: Boolean = false): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    def cell(base: org.apache.spark.sql.Column, m: Int) =
      when($"l_orderkey" % 23 === 0 || $"l_orderkey" % m === 0,
        lit(null).cast("float")).otherwise(base.cast("float"))
    val base = t(s, d, "lineitem").select(
      $"l_suppkey".cast("string").as("sample_label"),
      $"l_partkey".cast("string").as("probe_id"),
      when($"l_partkey" % 3 === 0, "II").otherwise("I").as("inf_type"),
      when($"l_partkey" % 2 === 0, "G").otherwise("R").as("channel"),
      when($"l_partkey" % 5 < 3, "cg")
        .when($"l_partkey" % 5 === 3, "ch").otherwise("snp")
        .as("probe_type"),
      cell($"l_quantity", 11).as("meth_g"),
      cell(($"l_orderkey" * 3 + $"l_linenumber") % 47, 13)
        .as("unmeth_g"),
      cell(($"l_orderkey" * 7 + $"l_linenumber") % 53, 17)
        .as("meth_r"),
      cell(($"l_orderkey" * 11 + $"l_linenumber" * 5) % 59, 19)
        .as("unmeth_r"))
    if (withProbeType) base else base.drop("probe_type")
  }

  /** The q65 sig CTE, shared by the oracles below. */
  private val sigSql = """
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               CAST(l_partkey AS VARCHAR) AS probe_id,
               CASE WHEN l_partkey % 3 = 0 THEN 'II' ELSE 'I' END
                 AS inf_type,
               CASE WHEN l_partkey % 2 = 0 THEN 'G' ELSE 'R' END
                 AS channel,
               CASE WHEN l_partkey % 5 < 3 THEN 'cg'
                    WHEN l_partkey % 5 = 3 THEN 'ch'
                    ELSE 'snp' END AS probe_type,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 11 = 0
                    THEN NULL ELSE CAST(l_quantity AS FLOAT) END
                 AS meth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 3 + l_linenumber) % 47
                              AS FLOAT) END AS unmeth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 17 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 7 + l_linenumber) % 53
                              AS FLOAT) END AS meth_r,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 19 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 11 + l_linenumber * 5) % 59
                              AS FLOAT) END AS unmeth_r
        FROM lineitem"""

  /** A8 end-to-end — QC.intensitySummary (QC.scala:16, reference
    * quality_control.py:55-130): per-sample mean / exact median / NA
    * counts of the summed M and U intensities, where a cell contributes
    * coalesce(g,0)+coalesce(r,0) unless BOTH channels are NULL. Cells
    * are integer-valued, so sums and interpolated medians are exact on
    * both engines. */
  val q74 = Q(
    "q74_qc_intensity_summary",
    (s, d) => {
      import s.implicits._
      graft.qc.QC.intensitySummary(sigA(s, d))
        .select($"sample_label",
          emit6($"mean_meth").as("mean_meth"),
          emit6($"median_meth").as("median_meth"),
          emit6($"mean_unmeth").as("mean_unmeth"),
          emit6($"median_unmeth").as("median_unmeth"),
          $"n_na_meth", $"n_na_unmeth", $"n_probes")
        .orderBy($"sample_label")
    },
    Some(s"""
      WITH sig AS ($sigSql
      ), cells AS (
        SELECT sample_label,
               CASE WHEN meth_g IS NULL AND meth_r IS NULL THEN NULL
                    ELSE CAST(coalesce(meth_g, 0) + coalesce(meth_r, 0)
                              AS DOUBLE) END AS m,
               (meth_g IS NULL AND meth_r IS NULL) AS m_null,
               CASE WHEN unmeth_g IS NULL AND unmeth_r IS NULL THEN NULL
                    ELSE CAST(coalesce(unmeth_g, 0)
                              + coalesce(unmeth_r, 0) AS DOUBLE) END AS u,
               (unmeth_g IS NULL AND unmeth_r IS NULL) AS u_null
        FROM sig
      )
      SELECT sample_label,
             round(avg(m), 6) + 0.0 AS mean_meth,
             round(quantile_cont(m, 0.5), 6) + 0.0 AS median_meth,
             round(avg(u), 6) + 0.0 AS mean_unmeth,
             round(quantile_cont(u, 0.5), 6) + 0.0 AS median_unmeth,
             CAST(sum(CASE WHEN m_null THEN 1 ELSE 0 END) AS BIGINT)
               AS n_na_meth,
             CAST(sum(CASE WHEN u_null THEN 1 ELSE 0 END) AS BIGINT)
               AS n_na_unmeth,
             count(*) AS n_probes
      FROM cells GROUP BY sample_label
      ORDER BY sample_label"""))

  /** A6 end-to-end — QC.probeCounts (QC.scala:46, reference
    * samples.py:1703-1731): signal × broadcast manifest chromosome
    * lookup, per-(sample, chromosome) probe and fully-masked counts.
    * The manifest derives from `part` (probe universe ⊇ lineitem
    * partkeys, so the left join never dangles); n_masked counts the
    * orderkey%23 rows whose four cells are all NULL. */
  val q75 = Q(
    "q75_probe_counts_per_chromosome",
    (s, d) => {
      import s.implicits._
      val manifest = t(s, d, "part").select(
        $"p_partkey".cast("string").as("probe_id"),
        concat(lit("chr"), (($"p_partkey" % 22) + 1).cast("string"))
          .as("chromosome"))
      graft.qc.QC.probeCounts(sigA(s, d), manifest)
        .orderBy($"sample_label", $"chromosome")
    },
    Some(s"""
      WITH sig AS ($sigSql
      ), manifest AS (
        SELECT CAST(p_partkey AS VARCHAR) AS probe_id,
               'chr' || CAST(p_partkey % 22 + 1 AS VARCHAR)
                 AS chromosome
        FROM part
      )
      SELECT s.sample_label, m.chromosome,
             count(*) AS n_probes,
             CAST(sum(CASE WHEN s.meth_g IS NULL AND s.meth_r IS NULL
                            AND s.unmeth_g IS NULL
                            AND s.unmeth_r IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
      FROM sig s LEFT JOIN manifest m USING (probe_id)
      GROUP BY s.sample_label, m.chromosome
      ORDER BY s.sample_label, m.chromosome"""))

  /** A10 end-to-end — QC.mostVariableProbes (QC.scala:85, reference
    * ml.py:62-66): per-probe sample variance via the exact moments
    * spelling + global top-N. Betas are integer-valued, so Σx and Σx²
    * are exact on both engines and the variance is the same double
    * bit-for-bit — the top-100 cut (ties broken by probe_id) is
    * engine-invariant. */
  val q76 = Q(
    "q76_most_variable_probes",
    (s, d) => {
      import s.implicits._
      val betas = t(s, d, "lineitem").select(
        ($"l_suppkey" % 32).cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_orderkey" % 23 === 0, lit(null).cast("double"))
          .otherwise((($"l_orderkey" * 7 + $"l_linenumber") % 101)
            .cast("double")).as("beta"))
      graft.qc.QC.mostVariableProbes(betas, 100)
        .select($"probe_id",
          emit6($"beta_variance").as("beta_variance"))
        .orderBy($"beta_variance".desc, $"probe_id")
    },
    Some("""
      WITH betas AS (
        SELECT CAST(l_suppkey % 32 AS VARCHAR) AS sample_label,
               CAST(l_partkey AS VARCHAR) AS probe_id,
               CASE WHEN l_orderkey % 23 = 0 THEN NULL
                    ELSE CAST((l_orderkey * 7 + l_linenumber) % 101
                              AS DOUBLE) END AS beta
        FROM lineitem
      ), agg AS (
        SELECT probe_id, count(*) AS n_obs, sum(beta) AS s1,
               sum(beta * beta) AS s2
        FROM betas WHERE beta IS NOT NULL GROUP BY probe_id
      ), v AS (
        SELECT probe_id,
               (s2 - s1 * s1 / n_obs) / (n_obs - 1) AS beta_variance
        FROM agg WHERE n_obs > 1
      )
      SELECT probe_id, round(beta_variance, 6) + 0.0 AS beta_variance
      FROM v
      ORDER BY beta_variance DESC, probe_id
      LIMIT 100"""))

  /** L11 end-to-end — Prep.scrubBackgroundCorrection (Prep.scala:251,
    * reference samples.py:1504-1527): subtract the per-(sample, channel)
    * OOB median from every cell of that measurement channel, clip at 1,
    * NULL cells stay NULL (np.clip(NaN) is NaN — this query gates the
    * NULL-preservation fix). Medians of integers are exact (worst case
    * .5), so every scrubbed cell is an exact dyadic float. */
  val q77 = Q(
    "q77_scrub_endtoend",
    (s, d) => {
      import s.implicits._
      graft.prep.Prep.scrubBackgroundCorrection(sigA(s, d))
        .select($"sample_label", $"probe_id", $"inf_type", $"channel",
          $"meth_g", $"unmeth_g", $"meth_r", $"unmeth_r")
        .orderBy($"sample_label", $"probe_id", $"meth_g", $"unmeth_g",
          $"meth_r", $"unmeth_r")
    },
    Some(s"""
      WITH sig AS ($sigSql
      ), oob AS (
        -- oobCells: type-I probes read the OPPOSITE channel's two cells
        SELECT sample_label, 'G' AS ch, meth_g AS v FROM sig
          WHERE inf_type = 'I' AND channel = 'R' AND meth_g IS NOT NULL
        UNION ALL
        SELECT sample_label, 'G', unmeth_g FROM sig
          WHERE inf_type = 'I' AND channel = 'R' AND unmeth_g IS NOT NULL
        UNION ALL
        SELECT sample_label, 'R', meth_r FROM sig
          WHERE inf_type = 'I' AND channel = 'G' AND meth_r IS NOT NULL
        UNION ALL
        SELECT sample_label, 'R', unmeth_r FROM sig
          WHERE inf_type = 'I' AND channel = 'G' AND unmeth_r IS NOT NULL
      ), med AS (
        SELECT sample_label,
               quantile_cont(CASE WHEN ch = 'G'
                 THEN CAST(v AS DOUBLE) END, 0.5) AS bg_g,
               quantile_cont(CASE WHEN ch = 'R'
                 THEN CAST(v AS DOUBLE) END, 0.5) AS bg_r
        FROM oob GROUP BY sample_label
      )
      SELECT s.sample_label, s.probe_id, s.inf_type, s.channel,
             CASE WHEN s.meth_g IS NULL OR m.bg_g IS NULL THEN NULL
                  ELSE CAST(greatest(CAST(s.meth_g AS DOUBLE) - m.bg_g,
                                     1.0) AS FLOAT) END AS meth_g,
             CASE WHEN s.unmeth_g IS NULL OR m.bg_g IS NULL THEN NULL
                  ELSE CAST(greatest(CAST(s.unmeth_g AS DOUBLE) - m.bg_g,
                                     1.0) AS FLOAT) END AS unmeth_g,
             CASE WHEN s.meth_r IS NULL OR m.bg_r IS NULL THEN NULL
                  ELSE CAST(greatest(CAST(s.meth_r AS DOUBLE) - m.bg_r,
                                     1.0) AS FLOAT) END AS meth_r,
             CASE WHEN s.unmeth_r IS NULL OR m.bg_r IS NULL THEN NULL
                  ELSE CAST(greatest(CAST(s.unmeth_r AS DOUBLE) - m.bg_r,
                                     1.0) AS FLOAT) END AS unmeth_r
      FROM sig s LEFT JOIN med m USING (sample_label)
      ORDER BY sample_label, probe_id, meth_g, unmeth_g, meth_r,
               unmeth_r"""))

  /** F4/F5/F6/F10 end-to-end — the Samples selector family
    * (Samples.scala:60-111, reference samples.py:123-414): sample
    * subset + drop (F10), cg-probe filter (F6), type-I-green filter
    * (F4) and the meth column slice (F5), composed the way a
    * pylluminator session chains them. Pure filters + projection — the
    * oracle is the conjunctive WHERE. */
  val q78 = Q(
    "q78_selectors_slice",
    (s, d) => {
      import s.implicits._
      val base = graft.Samples(s, sigA(s, d, withProbeType = true)
        .withColumn("mask_info", lit(""))
        .withColumn("p_value", lit(null).cast("float")),
        graft.core.Masks.empty(s))
      val labels = base.sampleLabels
      val sub = base.subset(labels.filter(_.toLong % 4 != 3))
        .dropSamples(labels.filter(_.toLong % 7 == 2))
      val cg = sub.copy(signal = sub.cgProbes(applyMask = false))
      val green = cg.copy(signal = cg.type1Green(applyMask = false))
      green.meth(applyMask = false)
        .select($"sample_label", $"probe_id", $"probe_type",
          $"inf_type", $"channel", $"meth_g", $"meth_r")
        .orderBy($"sample_label", $"probe_id", $"meth_g", $"meth_r")
    },
    Some(s"""
      WITH sig AS ($sigSql
      )
      SELECT sample_label, probe_id, probe_type, inf_type, channel,
             meth_g, meth_r
      FROM sig
      WHERE CAST(sample_label AS BIGINT) % 4 <> 3
        AND CAST(sample_label AS BIGINT) % 7 <> 2
        AND probe_type = 'cg'
        AND inf_type = 'I' AND channel = 'G'
      ORDER BY sample_label, probe_id, meth_g, meth_r"""))

  /** R4/A10 end-to-end — Ml.topVarianceMatrix (Ml.scala:24, reference
    * ml.py:40-60): the distributed top-variance selection followed by
    * the sample × probe matrix assembly with probe-mean imputation of
    * missing cells — the exact frame handed to sklearn in the
    * reference. Betas are pre-aggregated to unique (sample, probe)
    * keys (min over the group, exact); the imputed mean is a single
    * division of exact integer sums, so every cell is engine-exact. */
  val q79 = Q(
    "q79_ml_matrix_impute",
    (s, d) => {
      import s.implicits._
      val betas = t(s, d, "lineitem")
        .groupBy(($"l_suppkey" % 32).cast("string").as("sample_label"),
          $"l_partkey".cast("string").as("probe_id"))
        .agg(min(when($"l_orderkey" % 23 === 0,
          lit(null).cast("double"))
          .otherwise((($"l_orderkey" * 7 + $"l_linenumber") % 101)
            .cast("double"))).as("beta"))
      val (samples, probes, mat) =
        graft.ml.Ml.topVarianceMatrix(betas, 50)
      val rows = for {
        i <- samples.indices
        j <- probes.indices
      } yield (samples(i), probes(j), mat(i, j))
      rows.toDF("sample_label", "probe_id", "value")
        .select($"sample_label", $"probe_id",
          emit6($"value").as("value"))
        .orderBy($"sample_label", $"probe_id")
    },
    Some("""
      WITH betas AS (
        SELECT CAST(l_suppkey % 32 AS VARCHAR) AS sample_label,
               CAST(l_partkey AS VARCHAR) AS probe_id,
               min(CASE WHEN l_orderkey % 23 = 0 THEN NULL
                        ELSE CAST((l_orderkey * 7 + l_linenumber) % 101
                                  AS DOUBLE) END) AS beta
        FROM lineitem
        GROUP BY 1, 2
      ), agg AS (
        SELECT probe_id, count(*) AS n_obs, sum(beta) AS s1,
               sum(beta * beta) AS s2, avg(beta) AS mean_beta
        FROM betas WHERE beta IS NOT NULL GROUP BY probe_id
      ), top AS (
        SELECT probe_id, mean_beta,
               (s2 - s1 * s1 / n_obs) / (n_obs - 1) AS v
        FROM agg WHERE n_obs > 1
        ORDER BY v DESC, probe_id
        LIMIT 50
      ), samples AS (
        SELECT DISTINCT sample_label FROM betas
      ), grid AS (
        SELECT s.sample_label, t.probe_id, t.mean_beta
        FROM samples s CROSS JOIN top t
      )
      SELECT g.sample_label, g.probe_id,
             round(coalesce(b.beta, g.mean_beta), 6) + 0.0 AS value
      FROM grid g LEFT JOIN betas b
        ON b.sample_label = g.sample_label AND b.probe_id = g.probe_id
      ORDER BY g.sample_label, g.probe_id"""))

  /** L21 end-to-end — Ml.hierarchicalClustering (Ml.scala:124, reference
    * visualizations.py:670 via scipy complete linkage): the full merge
    * dendrogram over a 12-sample × 8-feature matrix of exact integer
    * sums. Leaf distances are sqrt of exact-integer squared sums
    * (deterministic on both engines — IEEE sqrt is correctly rounded),
    * and the argmin tie-break (d, a, b) mirrors the sorted-id scan
    * order of the Scala loop. The oracle replays the n−1 agglomeration
    * steps as a RECURSIVE CTE whose working set carries cluster
    * membership rows; each step aggregates the complete-linkage max
    * over cross-cluster leaf pairs and window-picks the argmin. */
  val q80 = Q(
    "q80_hierarchical_clustering",
    (s, d) => {
      import s.implicits._
      // the n_samples × n_features boundary the reference hands to
      // scipy — distributed aggregation, KB-scale collect
      val cells = t(s, d, "lineitem")
        .groupBy(($"l_suppkey" % 12).cast("int").as("si"),
          ($"l_partkey" % 8).cast("int").as("fj"))
        .agg(sum($"l_quantity".cast("long")).as("v"))
        .collect()
      // leaf index = rank of si among the PRESENT residues (small sfs
      // don't populate all twelve) — a fixed-size matrix would cluster
      // phantom all-zero samples
      val idx = cells.map(_.getInt(0)).distinct.sorted.zipWithIndex.toMap
      val x = breeze.linalg.DenseMatrix.zeros[Double](idx.size, 8)
      cells.foreach(r => x(idx(r.getInt(0)), r.getInt(1)) =
        r.getLong(2).toDouble)
      graft.ml.Ml.hierarchicalClustering(x).zipWithIndex.map {
        case (mg, i) => (i + 1, mg.a, mg.b, mg.dist, mg.size)
      }.toDF("step", "cluster_a", "cluster_b", "dist", "size")
        .select($"step", $"cluster_a", $"cluster_b",
          emit6($"dist").as("dist"), $"size")
        .orderBy($"step")
    },
    Some("""
      WITH RECURSIVE cells AS (
        SELECT CAST(l_suppkey % 12 AS INT) AS si,
               CAST(l_partkey % 8 AS INT) AS fj,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS v
        FROM lineitem GROUP BY 1, 2
      ), leaves AS (
        -- leaf index = rank of si among present residues (matches the
        -- Scala index map at every sf)
        SELECT si, CAST(dense_rank() OVER (ORDER BY si) - 1 AS INT)
                 AS leaf
        FROM (SELECT DISTINCT si FROM cells)
      ), grid AS (
        SELECT l.leaf, f.fj, coalesce(c.v, 0.0) AS v
        FROM leaves l
        CROSS JOIN (SELECT DISTINCT fj FROM cells) f
        LEFT JOIN cells c ON c.si = l.si AND c.fj = f.fj
      ), pd AS (
        SELECT a.leaf AS i, b.leaf AS j,
               sqrt(sum((a.v - b.v) * (a.v - b.v))) AS d
        FROM grid a JOIN grid b ON a.fj = b.fj AND a.leaf < b.leaf
        GROUP BY 1, 2
      ), n AS (SELECT count(*) AS n FROM leaves),
      st AS (
        SELECT 0 AS iter, 'm' AS kind, leaf AS cid, leaf,
               CAST(NULL AS INT) AS ca, CAST(NULL AS INT) AS cb,
               CAST(NULL AS DOUBLE) AS d, CAST(NULL AS INT) AS sz
        FROM leaves
        UNION ALL
        (
          WITH mem AS (SELECT iter, cid, leaf FROM st WHERE kind = 'm'),
          cd AS (
            SELECT x.cid AS ca, y.cid AS cb, max(p.d) AS d
            FROM mem x JOIN mem y ON x.cid < y.cid
            JOIN pd p ON p.i = least(x.leaf, y.leaf)
                     AND p.j = greatest(x.leaf, y.leaf)
            GROUP BY 1, 2
          ),
          best AS (
            SELECT ca, cb, d
            FROM cd
            QUALIFY row_number() OVER (ORDER BY d, ca, cb) = 1
          ),
          it AS (SELECT max(iter) + 1 AS t,
                        (SELECT n FROM n) + max(iter) AS nid FROM mem)
          SELECT it.t AS iter, 'm' AS kind,
                 CASE WHEN m.cid IN (b.ca, b.cb) THEN it.nid
                      ELSE m.cid END,
                 m.leaf, NULL, NULL, NULL, NULL
          FROM mem m CROSS JOIN best b CROSS JOIN it
          UNION ALL
          SELECT it.t, 'e', NULL, NULL, b.ca, b.cb, b.d,
                 (SELECT count(*) FROM mem WHERE cid IN (b.ca, b.cb))
          FROM best b CROSS JOIN it
        )
      )
      SELECT iter AS step, ca AS cluster_a, cb AS cluster_b,
             round(d, 6) + 0.0 AS dist, sz AS size
      FROM st WHERE kind = 'e' ORDER BY step"""))

  /** Round-and-normalize at coarser precision for the mixed-LM surface:
    * the golden-section likelihood search takes ~36 libm-dependent
    * branches per probe, so outputs carry O(1e-8) engine drift —
    * round(·, 2) sits orders of magnitude above it (the q63 tier). */
  private[queries] def emit2(c: org.apache.spark.sql.Column) =
    round(nanvl(c, lit(null).cast("double")), 2) + lit(0.0)

  /** L2 end-to-end — Dm.computeDmpMixed (Dm.scala:254, reference
    * dm.py:62-67 delegating to statsmodels MixedLM): per-probe
    * random-intercept LMM, REML profiled likelihood over the variance
    * ratio by golden-section search, Wald z inference. Betas are exact
    * integers ((Σqty) mod 97) over ≥8 samples per probe, x = suppkey%7
    * (never collinear within a probe subset at any sf), replicate
    * group = suppkey%3. The oracle replays the EXACT golden-section
    * iterate sequence (~36 steps, same bracket updates and stopping
    * rule) as a RECURSIVE CTE whose per-iteration likelihood evaluation
    * aggregates the Sherman-Morrison block sums per replicate group,
    * and the Wald p via the Cody erfc transcription. */
  val q81 = Q(
    "q81_dmp_mixedlm_endtoend",
    (s, d) => {
      import s.implicits._
      val betasAll = t(s, d, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg((sum($"l_quantity".cast("long")) % 97).cast("double")
          .as("beta"))
        .select($"l_suppkey".cast("string").as("sample_label"),
          $"l_partkey".cast("string").as("probe_id"), $"beta")
      // eligibility (≥8 obs) as a count window on probe_id, not a
      // separate agg + join: the window's hash partitioning on probe_id
      // is exactly what computeDmpMixed's groupBy(probe_id) requires, so
      // the whole chain runs on ONE probe-keyed exchange
      val betas = betasAll
        .withColumn("n_obs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("probe_id")))
        .filter($"n_obs" >= 8).drop("n_obs")
      val sheetRows = t(s, d, "supplier")
        .select($"s_suppkey".cast("string")).collect().map { r =>
          val k = r.getString(0)
          Map("sample_label" -> k, "xcov" -> (k.toLong % 7).toString,
            "rep" -> (k.toLong % 3).toString)
        }.toSeq
      val design =
        graft.dm.Dm.designMatrix(sheetRows, "sample_label", "~ xcov")
      val groups =
        sheetRows.map(m => m("sample_label") -> m("rep")).toMap
      graft.dm.Dm.computeDmpMixed(s, betas, design, groups)
        .select($"probe_id",
          emit2($"effect_size").as("effect_size"),
          emit2($"Intercept_estimate").as("intercept_estimate"),
          emit2($"Intercept_std_err").as("intercept_std_err"),
          emit2($"Intercept_t_value").as("intercept_z"),
          emit2($"Intercept_p_value").as("intercept_p_value"),
          emit2($"xcov_estimate").as("xcov_estimate"),
          emit2($"xcov_std_err").as("xcov_std_err"),
          emit2($"xcov_t_value").as("xcov_z"),
          emit2($"xcov_p_value").as("xcov_p_value"),
          emit2($"xcov_p_value_adjusted").as("xcov_p_value_adjusted"))
        .orderBy($"probe_id")
    },
    Some("""
      WITH RECURSIVE betas AS (
        SELECT CAST(l_partkey AS VARCHAR) AS probe_id,
               CAST(l_suppkey AS VARCHAR) AS sample_label,
               CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) % 97
                    AS DOUBLE) AS y,
               CAST(l_suppkey % 7 AS DOUBLE) AS x,
               CAST(l_suppkey % 3 AS INT) AS grp
        FROM lineitem GROUP BY l_partkey, l_suppkey
      ), eligible AS (
        SELECT probe_id FROM betas GROUP BY probe_id HAVING count(*) >= 8
      ), obs AS (
        SELECT b.* FROM betas b JOIN eligible e USING (probe_id)
      ), pstats AS (
        SELECT probe_id, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(x * x) AS sxx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(y * y) AS syy
        FROM obs GROUP BY probe_id
      ), gstats AS (
        SELECT probe_id, grp, CAST(count(*) AS DOUBLE) AS m,
               sum(x) AS sxg, sum(y) AS syg
        FROM obs GROUP BY probe_id, grp
      ), consts AS (
        SELECT ln(1e-8) AS lo0, ln(1e4) AS hi0,
               (sqrt(5.0) - 1.0) / 2.0 AS phi
      ), init_pts AS (
        SELECT 1 AS which, hi0 - phi * (hi0 - lo0) AS c FROM consts
        UNION ALL
        SELECT 2, lo0 + phi * (hi0 - lo0) FROM consts
      ), ev0s AS (
        SELECT p.probe_id, i.which, i.c, p.n, p.sx, p.sxx, p.sy, p.sxy, p.syy,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.m * g.m) AS s_cm2,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.m * g.sxg) AS s_cmsx,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.sxg * g.sxg) AS s_csx2,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.m * g.syg) AS s_cmsy,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.sxg * g.syg) AS s_csxsy,
               sum(exp(i.c) / (1.0 + exp(i.c) * g.m) * g.syg * g.syg) AS s_csy2,
               sum(ln(1.0 + exp(i.c) * g.m)) AS ldv
        FROM pstats p CROSS JOIN init_pts i
        JOIN gstats g USING (probe_id)
        GROUP BY ALL
      ), ev0 AS (
        SELECT probe_id, which,
               0.5 * ((n - 2) * ln(((syy - s_csy2)
                   - (((sxx - s_csx2) * (sy - s_cmsy)
                       - (sx - s_cmsx) * (sxy - s_csxsy))
                      / ((n - s_cm2) * (sxx - s_csx2)
                         - (sx - s_cmsx) * (sx - s_cmsx)) * (sy - s_cmsy)
                      + ((n - s_cm2) * (sxy - s_csxsy)
                         - (sx - s_cmsx) * (sy - s_cmsy))
                        / ((n - s_cm2) * (sxx - s_csx2)
                           - (sx - s_cmsx) * (sx - s_cmsx)) * (sxy - s_csxsy)))
                   / (n - 2)) + ldv + (n - 2))
               + 0.5 * ln((n - s_cm2) * (sxx - s_csx2)
                          - (sx - s_cmsx) * (sx - s_cmsx)) AS f
        FROM ev0s
      ), gold AS (
        SELECT p.probe_id, p.n, p.sx, p.sxx, p.sy, p.sxy, p.syy,
               c.lo0 AS lo, c.hi0 AS hi,
               c.hi0 - c.phi * (c.hi0 - c.lo0) AS c1,
               c.lo0 + c.phi * (c.hi0 - c.lo0) AS c2,
               e1.f AS f1, e2.f AS f2, 0 AS it
        FROM pstats p CROSS JOIN consts c
        JOIN ev0 e1 ON e1.probe_id = p.probe_id AND e1.which = 1
        JOIN ev0 e2 ON e2.probe_id = p.probe_id AND e2.which = 2
        UNION ALL
        SELECT e.probe_id, e.n, e.sx, e.sxx, e.sy, e.sxy, e.syy,
               e.lo2 AS lo, e.hi2 AS hi,
               CASE WHEN e.up THEN e.cn ELSE e.c2 END AS c1,
               CASE WHEN e.up THEN e.c1 ELSE e.cn END AS c2,
               CASE WHEN e.up THEN e.fn ELSE e.f2 END AS f1,
               CASE WHEN e.up THEN e.f1 ELSE e.fn END AS f2,
               e.it + 1 AS it
        FROM (
          SELECT s.*,
                 0.5 * ((s.n - 2) * ln(((s.syy - s.s_csy2)
                     - (((s.sxx - s.s_csx2) * (s.sy - s.s_cmsy)
                         - (s.sx - s.s_cmsx) * (s.sxy - s.s_csxsy))
                        / ((s.n - s.s_cm2) * (s.sxx - s.s_csx2)
                           - (s.sx - s.s_cmsx) * (s.sx - s.s_cmsx))
                          * (s.sy - s.s_cmsy)
                        + ((s.n - s.s_cm2) * (s.sxy - s.s_csxsy)
                           - (s.sx - s.s_cmsx) * (s.sy - s.s_cmsy))
                          / ((s.n - s.s_cm2) * (s.sxx - s.s_csx2)
                             - (s.sx - s.s_cmsx) * (s.sx - s.s_cmsx))
                          * (s.sxy - s.s_csxsy)))
                     / (s.n - 2)) + s.ldv + (s.n - 2))
                 + 0.5 * ln((s.n - s.s_cm2) * (s.sxx - s.s_csx2)
                            - (s.sx - s.s_cmsx) * (s.sx - s.s_cmsx)) AS fn
          FROM (
            SELECT gs.probe_id, gs.n, gs.sx, gs.sxx, gs.sy, gs.sxy, gs.syy,
                   gs.lo2, gs.hi2, gs.c1, gs.c2, gs.f1, gs.f2, gs.it, gs.up,
                   gs.cn,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.m * g.m)
                     AS s_cm2,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.m * g.sxg)
                     AS s_cmsx,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.sxg * g.sxg)
                     AS s_csx2,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.m * g.syg)
                     AS s_cmsy,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.sxg * g.syg)
                     AS s_csxsy,
                   sum(exp(gs.cn) / (1.0 + exp(gs.cn) * g.m) * g.syg * g.syg)
                     AS s_csy2,
                   sum(ln(1.0 + exp(gs.cn) * g.m)) AS ldv
            FROM (
              SELECT w.*,
                     CASE WHEN w.up
                          THEN w.hi2 - (sqrt(5.0) - 1.0) / 2.0
                               * (w.hi2 - w.lo2)
                          ELSE w.lo2 + (sqrt(5.0) - 1.0) / 2.0
                               * (w.hi2 - w.lo2) END AS cn
              FROM (
                SELECT gold.*, (f1 < f2) AS up,
                       CASE WHEN f1 < f2 THEN lo ELSE c1 END AS lo2,
                       CASE WHEN f1 < f2 THEN c2 ELSE hi END AS hi2
                FROM gold
                WHERE hi - lo > 1e-6 AND it < 200
              ) w
            ) gs JOIN gstats g USING (probe_id)
            GROUP BY ALL
          ) s
        ) e
      ), goldf AS (
        SELECT * FROM gold
        QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY it DESC) = 1
      ), fins AS (
        SELECT p.probe_id, p.n, p.sx, p.sxx, p.sy, p.sxy, p.syy,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.m * g.m) AS s_cm2,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.m * g.sxg)
                 AS s_cmsx,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.sxg * g.sxg)
                 AS s_csx2,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.m * g.syg)
                 AS s_cmsy,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.sxg * g.syg)
                 AS s_csxsy,
               sum(exp((f.lo + f.hi) / 2)
                   / (1.0 + exp((f.lo + f.hi) / 2) * g.m) * g.syg * g.syg)
                 AS s_csy2
        FROM goldf f JOIN pstats p USING (probe_id)
        JOIN gstats g USING (probe_id)
        GROUP BY ALL
      ), fin1 AS (
        SELECT probe_id, n,
               n - s_cm2 AS a11, sx - s_cmsx AS a12, sxx - s_csx2 AS a22,
               sy - s_cmsy AS b1, sxy - s_csxsy AS b2, syy - s_csy2 AS yt
        FROM fins
      ), fin2 AS (
        SELECT *, a11 * a22 - a12 * a12 AS det FROM fin1
      ), fin3 AS (
        SELECT *,
               (a22 * b1 - a12 * b2) / det AS beta0,
               (a11 * b2 - a12 * b1) / det AS beta1
        FROM fin2
      ), fin4 AS (
        SELECT *,
               (yt - (beta0 * b1 + beta1 * b2)) / (n - 2) AS s2
        FROM fin3
      ), fin5 AS (
        SELECT probe_id, beta0, beta1,
               sqrt(s2 * a22 / det) AS se0,
               sqrt(s2 * a11 / det) AS se1,
               beta0 / sqrt(s2 * a22 / det) AS z0,
               beta1 / sqrt(s2 * a11 / det) AS z1
        FROM fin4
      ), pz AS (
        SELECT probe_id, beta0, beta1, se0, se1, z0, z1, 'i' AS coef,
               abs(z0) / sqrt(2.0) AS u
        FROM fin5
        UNION ALL
        SELECT probe_id, beta0, beta1, se0, se1, z0, z1, 'x',
               abs(z1) / sqrt(2.0)
        FROM fin5
      ), erfc1 AS (
        SELECT *,
          u * ((((1.85777706184603153e-1 * (u*u) + 3.16112374387056560e+0)
                  * (u*u) + 1.13864154151050156e+2)
                  * (u*u) + 3.77485237685302021e+2)
                  * (u*u) + 3.20937758913846947e+3)
            / (((((u*u) + 2.36012909523441209e+1)
                  * (u*u) + 2.44024637934444173e+2)
                  * (u*u) + 1.28261652607737228e+3)
                  * (u*u) + 2.84423683343917062e+3) AS erf_small,
          ((((((((2.15311535474403846e-8 * u + 5.64188496988670089e-1)
              * u + 8.88314979438837594e+0) * u + 6.61191906371416295e+1)
              * u + 2.98635138197400131e+2) * u + 8.81952221241769090e+2)
              * u + 1.71204761263407058e+3) * u + 2.05107837782607147e+3)
              * u + 1.23033935479799725e+3)
          / ((((((((u + 1.57449261107098347e+1) * u
              + 1.17693950891312499e+2) * u + 5.37181101862009858e+2)
              * u + 1.62138957456669019e+3) * u + 3.29079923573345963e+3)
              * u + 4.36261909014324716e+3) * u + 3.43936767414372164e+3)
              * u + 1.23033935480374942e+3) AS pq_mid,
          (5.6418958354775628695e-1
            - (1.0 / nullif(u*u, 0))
              * (((((1.63153871373020978e-2 * (1.0 / nullif(u*u, 0))
                    + 3.05326634961232344e-1) * (1.0 / nullif(u*u, 0))
                    + 3.60344899949804439e-1) * (1.0 / nullif(u*u, 0))
                    + 1.25781726111229246e-1) * (1.0 / nullif(u*u, 0))
                    + 1.60837851487422766e-2) * (1.0 / nullif(u*u, 0))
                   + 6.58749161529837803e-4)
              / ((((((1.0 / nullif(u*u, 0)) + 2.56852019228982242e+0)
                    * (1.0 / nullif(u*u, 0)) + 1.87295284992346047e+0)
                    * (1.0 / nullif(u*u, 0)) + 5.27905102951428412e-1)
                    * (1.0 / nullif(u*u, 0)) + 6.05183413124413191e-2)
                    * (1.0 / nullif(u*u, 0)) + 2.33520497626869185e-3))
            / nullif(u, 0) AS el
        FROM pz
      ), erfc2 AS (
        SELECT probe_id, coef, beta0, beta1, se0, se1, z0, z1,
               CASE WHEN u < 0.46875 THEN 1.0 - erf_small
                    WHEN u <= 4.0 THEN exp(-(u*u)) * pq_mid
                    ELSE el * exp(-(u*u)) END AS p
        FROM erfc1
      ), pp AS (
        SELECT f.probe_id, f.beta0, f.beta1, f.se0, f.se1, f.z0, f.z1,
               pi.p AS p0, px.p AS p1
        FROM fin5 f
        JOIN erfc2 pi ON pi.probe_id = f.probe_id AND pi.coef = 'i'
        JOIN erfc2 px ON px.probe_id = f.probe_id AND px.coef = 'x'
      ), bh1 AS (
        SELECT probe_id, p1,
               row_number() OVER (ORDER BY p1) AS r,
               count(*) OVER () AS nn
        FROM pp
      ), bh2 AS (
        SELECT probe_id,
               least(min(p1 * nn / r) OVER (ORDER BY r DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0)
                 AS padj
        FROM bh1
      )
      SELECT p.probe_id,
             round(abs(p.beta1), 2) + 0.0 AS effect_size,
             round(p.beta0, 2) + 0.0 AS intercept_estimate,
             round(p.se0, 2) + 0.0 AS intercept_std_err,
             round(p.z0, 2) + 0.0 AS intercept_z,
             round(p.p0, 2) + 0.0 AS intercept_p_value,
             round(p.beta1, 2) + 0.0 AS xcov_estimate,
             round(p.se1, 2) + 0.0 AS xcov_std_err,
             round(p.z1, 2) + 0.0 AS xcov_z,
             round(p.p1, 2) + 0.0 AS xcov_p_value,
             round(b.padj, 2) + 0.0 AS xcov_p_value_adjusted
      FROM pp p JOIN bh2 b USING (probe_id)
      ORDER BY p.probe_id"""))

  /** M1-M4/M6/M7 end-to-end — the mask pipeline (Masks.scala:30-143,
    * reference mask.py:8-194, samples.py:577-831): build a regex
    * mask_info mask (M2), OVERRIDE it on the same (name, scope) key via
    * addMask (M7 replace semantics), add the global snp mask (M4) and a
    * sample-scoped pOOBAH mask (M6), remove the snp mask by name (M7),
    * then apply (M1): cells of hit (probe, sample) pairs NULLed, rows
    * kept. The oracle replays the surviving mask algebra as predicate
    * sets: custom = second regex only, snp removed, poobah per-pair. */
  val q82 = Q(
    "q82_masks_endtoend",
    (s, d) => {
      import s.implicits._
      def cell(base: org.apache.spark.sql.Column, m: Int) =
        when($"l_orderkey" % 23 === 0 || $"l_orderkey" % m === 0,
          lit(null).cast("float")).otherwise(base.cast("float"))
      val sig = t(s, d, "lineitem").select(
        $"l_suppkey".cast("string").as("sample_label"),
        $"l_partkey".cast("string").as("probe_id"),
        when($"l_partkey" % 5 < 3, "cg")
          .when($"l_partkey" % 5 === 3, "ch").otherwise("snp")
          .as("probe_type"),
        concat(
          when($"l_partkey" % 29 === 0, "M_mapping;").otherwise(""),
          when($"l_partkey" % 31 === 0, "M_nonuniq").otherwise(""))
          .as("mask_info"),
        cell($"l_quantity", 11).as("meth_g"),
        cell(($"l_orderkey" * 3 + $"l_linenumber") % 47, 13)
          .as("unmeth_g"),
        cell(($"l_orderkey" * 7 + $"l_linenumber") % 53, 17)
          .as("meth_r"),
        cell(($"l_orderkey" * 11 + $"l_linenumber" * 5) % 59, 19)
          .as("unmeth_r"),
        (($"l_orderkey" % 200).cast("double") / 1000.0).cast("float")
          .as("p_value"))
      import graft.core.Masks
      val m1 = Masks.addMask(Masks.empty(s),
        Masks.maskByNames(sig, "M_mapping", "custom"))
      // override: same (name, scope) key replaces the regex set (M7)
      val m2 = Masks.addMask(m1,
        Masks.maskByNames(sig, "M_nonuniq", "custom"))
      val m3 = Masks.addMask(m2, Masks.maskSnpProbes(sig))
      val m4 = Masks.addMask(m3, Masks.maskPoobah(sig, 0.05))
      val masks = Masks.removeMask(m4, maskName = Some("snp_probes"))
      Masks.applyMask(sig, masks)
        .select($"sample_label", $"probe_id", $"probe_type",
          $"meth_g", $"unmeth_g", $"meth_r", $"unmeth_r", $"p_value")
        .orderBy($"sample_label", $"probe_id", $"meth_g", $"unmeth_g",
          $"meth_r", $"unmeth_r", $"p_value")
    },
    Some("""
      WITH sig AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               CAST(l_partkey AS VARCHAR) AS probe_id,
               CASE WHEN l_partkey % 5 < 3 THEN 'cg'
                    WHEN l_partkey % 5 = 3 THEN 'ch'
                    ELSE 'snp' END AS probe_type,
               l_partkey % 31 = 0 AS is_nonuniq,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 11 = 0
                    THEN NULL ELSE CAST(l_quantity AS FLOAT) END
                 AS meth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 3 + l_linenumber) % 47
                              AS FLOAT) END AS unmeth_g,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 17 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 7 + l_linenumber) % 53
                              AS FLOAT) END AS meth_r,
               CASE WHEN l_orderkey % 23 = 0 OR l_orderkey % 19 = 0
                    THEN NULL
                    ELSE CAST((l_orderkey * 11 + l_linenumber * 5) % 59
                              AS FLOAT) END AS unmeth_r,
               CAST(CAST(l_orderkey % 200 AS DOUBLE) / 1000.0 AS FLOAT)
                 AS p_value
        FROM lineitem
      ), custom AS (
        -- the surviving 'custom' mask is the SECOND add (override):
        -- probes whose mask_info contains M_nonuniq; snp_probes was
        -- removed; poobah hits stay sample-scoped
        SELECT DISTINCT probe_id FROM sig WHERE is_nonuniq
      ), poobah AS (
        -- float→double promotion on the left, double 0.05 on the right:
        -- the exact comparison the engine's maskPoobah runs
        SELECT DISTINCT sample_label, probe_id FROM sig
        WHERE CAST(p_value AS DOUBLE) >= 0.05
      ), hit AS (
        SELECT s.*,
               (c.probe_id IS NOT NULL OR p.probe_id IS NOT NULL)
                 AS is_masked
        FROM sig s
        LEFT JOIN custom c ON c.probe_id = s.probe_id
        LEFT JOIN poobah p ON p.probe_id = s.probe_id
                          AND p.sample_label = s.sample_label
      )
      SELECT sample_label, probe_id, probe_type,
             CASE WHEN is_masked THEN NULL ELSE meth_g END AS meth_g,
             CASE WHEN is_masked THEN NULL ELSE unmeth_g END
               AS unmeth_g,
             CASE WHEN is_masked THEN NULL ELSE meth_r END AS meth_r,
             CASE WHEN is_masked THEN NULL ELSE unmeth_r END
               AS unmeth_r,
             CASE WHEN is_masked THEN NULL ELSE p_value END AS p_value
      FROM hit
      ORDER BY sample_label, probe_id, meth_g, unmeth_g, meth_r,
               unmeth_r, p_value"""))

  /** A5 end-to-end — SignalBuilder.removeProbeSuffixes
    * (SignalBuilder.scala:156, reference utils.py:126-141 +
    * samples.py:666-697): strip `_TC12`-style suffixes, average the
    * duplicate probes that result. The fixture plants matching (_TC/_BC)
    * and NON-matching (_XX) suffixes plus bare ids; betas are integers,
    * so the duplicate-group means are single exact divisions — the float
    * cast is bit-identical on both engines. */
  val q83 = Q(
    "q83_probe_suffix_dedup",
    (s, d) => {
      import s.implicits._
      val betas = t(s, d, "lineitem").select(
        ($"l_suppkey" % 16).cast("string").as("sample_label"),
        concat(lit("cg"), ($"l_partkey" % 300).cast("string"),
          when($"l_partkey" % 4 === 0,
            concat(lit("_TC"), ($"l_partkey" % 3 + 1).cast("string")))
            .when($"l_partkey" % 4 === 1,
              concat(lit("_BC"), ($"l_partkey" % 5 + 1).cast("string")))
            .when($"l_partkey" % 4 === 2, lit("_XX9"))
            .otherwise(lit(""))).as("probe_id"),
        (($"l_orderkey" * 5 + $"l_linenumber") % 89).cast("double")
          .as("beta"))
      graft.core.SignalBuilder.removeProbeSuffixes(betas)
        .orderBy($"sample_label", $"probe_id")
    },
    Some("""
      WITH betas AS (
        SELECT CAST(l_suppkey % 16 AS VARCHAR) AS sample_label,
               'cg' || CAST(l_partkey % 300 AS VARCHAR)
               || CASE WHEN l_partkey % 4 = 0
                       THEN '_TC' || CAST(l_partkey % 3 + 1 AS VARCHAR)
                       WHEN l_partkey % 4 = 1
                       THEN '_BC' || CAST(l_partkey % 5 + 1 AS VARCHAR)
                       WHEN l_partkey % 4 = 2 THEN '_XX9'
                       ELSE '' END AS probe_id,
               CAST((l_orderkey * 5 + l_linenumber) % 89 AS DOUBLE)
                 AS beta
        FROM lineitem
      )
      SELECT sample_label,
             regexp_replace(probe_id, '_[TB][CO][0-9]+$', '')
               AS probe_id,
             CAST(avg(beta) AS FLOAT) AS beta
      FROM betas
      GROUP BY sample_label,
               regexp_replace(probe_id, '_[TB][CO][0-9]+$', '')
      ORDER BY sample_label, probe_id"""))

  /** R1/J1/M5 end-to-end — SignalBuilder.build + minBeadsMask
    * (SignalBuilder.scala:46,85, reference samples.py:468-570): the full
    * ingest pipeline over an IDAT-shaped frame — min-beads nulling at
    * scan time, the broadcast manifest-address join (address A/B
    * explode, inner-join drop of unmapped addresses), methylation-state
    * derivation (type II: G→M/R→U on address A; type I: B→M/A→U), the
    * conditional-aggregation pivot to the four signal cells, and the
    * bootstrap min-beads mask. Every value is an exact integer; type II
    * address-B rows are planted as join noise that must drop. */
  val q84 = Q(
    "q84_signal_build_endtoend",
    (s, d) => {
      import s.implicits._
      val chans = array(
        struct(lit("G").as("ch"), lit(0L).as("chc"), lit("A").as("wa")),
        struct(lit("R").as("ch"), lit(1L).as("chc"), lit("A").as("wa")),
        struct(lit("G").as("ch"), lit(0L).as("chc"), lit("B").as("wa")),
        struct(lit("R").as("ch"), lit(1L).as("chc"), lit("B").as("wa")))
      val addr = when($"u.wa" === "A", $"l_partkey" * 2)
        .otherwise($"l_partkey" * 2 + 1).cast("long")
      val idat = t(s, d, "lineitem")
        .select($"l_suppkey", $"l_partkey", $"l_orderkey",
          $"l_linenumber", explode(chans).as("u"))
        .select(
          $"l_suppkey".cast("string").as("sample_label"),
          $"u.ch".as("signal_channel"),
          addr.as("illumina_id"),
          (($"l_orderkey" * 3 + $"l_linenumber" + addr + $"u.chc")
            % 211).cast("float").as("mean_value"),
          (($"l_orderkey" + addr + $"u.chc") % 8).cast("int")
            .as("n_beads"))
      val manifest = t(s, d, "part").select(
        $"p_partkey".cast("string").as("probe_id"),
        when($"p_partkey" % 3 === 0, "II").otherwise("I")
          .as("inf_type"),
        when($"p_partkey" % 2 === 0, "G").otherwise("R").as("channel"),
        when($"p_partkey" % 5 < 3, "cg")
          .when($"p_partkey" % 5 === 3, "ch").otherwise("snp")
          .as("probe_type"),
        when($"p_partkey" % 7 === 0, "M_mapping").otherwise("")
          .as("mask_info"),
        ($"p_partkey" * 2).cast("long").as("address_a"),
        when($"p_partkey" % 3 =!= 0, ($"p_partkey" * 2 + 1))
          .cast("long").as("address_b"))
      val sig = graft.core.SignalBuilder.build(idat, manifest,
        minBeads = 3)
      val mask = graft.core.SignalBuilder.minBeadsMask(sig, 3)
        .select($"sample_label", $"probe_id")
        .withColumn("is_min_beads_masked", lit(true))
      sig.join(mask, Seq("sample_label", "probe_id"), "left")
        .select($"sample_label", $"probe_id", $"inf_type", $"channel",
          $"probe_type", $"mask_info", $"meth_g", $"meth_r",
          $"unmeth_g", $"unmeth_r",
          coalesce($"is_min_beads_masked", lit(false))
            .as("is_min_beads_masked"))
        .orderBy($"sample_label", $"probe_id")
    },
    Some("""
      WITH idat AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS sample_label,
               u.ch AS signal_channel,
               CASE WHEN u.wa = 'A' THEN l_partkey * 2
                    ELSE l_partkey * 2 + 1 END AS illumina_id,
               CASE WHEN (l_orderkey
                          + (CASE WHEN u.wa = 'A' THEN l_partkey * 2
                                  ELSE l_partkey * 2 + 1 END)
                          + u.chc) % 8 < 3 THEN NULL
                    ELSE CAST((l_orderkey * 3 + l_linenumber
                               + (CASE WHEN u.wa = 'A'
                                       THEN l_partkey * 2
                                       ELSE l_partkey * 2 + 1 END)
                               + u.chc) % 211 AS FLOAT)
               END AS mean_value
        FROM lineitem
        CROSS JOIN (VALUES ('G', 0, 'A'), ('R', 1, 'A'),
                           ('G', 0, 'B'), ('R', 1, 'B'))
          AS u(ch, chc, wa)
      ), manifest AS (
        SELECT CAST(p_partkey AS VARCHAR) AS probe_id,
               CASE WHEN p_partkey % 3 = 0 THEN 'II' ELSE 'I' END
                 AS inf_type,
               CASE WHEN p_partkey % 2 = 0 THEN 'G' ELSE 'R' END
                 AS channel,
               CASE WHEN p_partkey % 5 < 3 THEN 'cg'
                    WHEN p_partkey % 5 = 3 THEN 'ch'
                    ELSE 'snp' END AS probe_type,
               CASE WHEN p_partkey % 7 = 0 THEN 'M_mapping'
                    ELSE '' END AS mask_info,
               p_partkey * 2 AS address_a,
               CASE WHEN p_partkey % 3 <> 0 THEN p_partkey * 2 + 1
               END AS address_b
        FROM part
      ), mba AS (
        SELECT probe_id, inf_type, channel, probe_type, mask_info,
               address_a AS illumina_id, 'A' AS which_address
        FROM manifest WHERE address_a IS NOT NULL
        UNION ALL
        SELECT probe_id, inf_type, channel, probe_type, mask_info,
               address_b, 'B'
        FROM manifest WHERE address_b IS NOT NULL
      ), joined AS (
        SELECT i.sample_label, i.signal_channel, i.mean_value,
               m.probe_id, m.inf_type, m.channel, m.probe_type,
               m.mask_info, m.which_address,
               CASE WHEN m.inf_type = 'II' THEN
                      CASE WHEN i.signal_channel = 'G' THEN 'M'
                           WHEN i.signal_channel = 'R' THEN 'U' END
                    WHEN m.inf_type = 'I' THEN
                      CASE WHEN m.which_address = 'B' THEN 'M'
                           WHEN m.which_address = 'A' THEN 'U' END
               END AS methylation_state
        FROM idat i JOIN mba m USING (illumina_id)
      ), sig AS (
        SELECT sample_label, probe_id, inf_type, channel, probe_type,
               coalesce(mask_info, '') AS mask_info,
               max(CASE WHEN signal_channel = 'G'
                         AND methylation_state = 'M'
                        THEN mean_value END) AS meth_g,
               max(CASE WHEN signal_channel = 'R'
                         AND methylation_state = 'M'
                        THEN mean_value END) AS meth_r,
               max(CASE WHEN signal_channel = 'G'
                         AND methylation_state = 'U'
                        THEN mean_value END) AS unmeth_g,
               max(CASE WHEN signal_channel = 'R'
                         AND methylation_state = 'U'
                        THEN mean_value END) AS unmeth_r
        FROM joined
        WHERE methylation_state IS NOT NULL
        GROUP BY 1, 2, 3, 4, 5, 6
      )
      SELECT sample_label, probe_id, inf_type, channel, probe_type,
             mask_info, meth_g, meth_r, unmeth_g, unmeth_r,
             (meth_g IS NULL OR unmeth_r IS NULL)
               AS is_min_beads_masked
      FROM sig
      ORDER BY sample_label, probe_id"""))

  /** PII scrubbing end-to-end — TextAnalysis.redactPii: per-type counts
    * on the original text + the fixed-order redaction chain (email →
    * ssn → phone → ip). PII shapes are PLANTED deterministically on top
    * of the natural document text by doc_id moduli, so every pattern
    * branch (and absence) is exercised; patterns are RE2-safe, so the
    * Java and DuckDB regex engines agree match-for-match. */
  val q85 = Q(
    "q85_pii_redaction",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").select($"doc_id",
        concat($"text",
          when($"doc_id" % 3 === 0,
            concat(lit(" email user"), $"doc_id", lit("@ex"),
              $"doc_id" % 5, lit(".org"))).otherwise(""),
          when($"doc_id" % 4 === 0,
            concat(lit(" ip "), $"doc_id" % 254 + 1, lit("."),
              $"doc_id" % 200 + 3, lit("."), $"doc_id" % 100,
              lit("."), $"doc_id" % 50)).otherwise(""),
          when($"doc_id" % 5 === 0,
            concat(lit(" ssn "), $"doc_id" % 900 + 100, lit("-"),
              $"doc_id" % 90 + 10, lit("-"),
              $"doc_id" % 9000 + 1000)).otherwise(""),
          when($"doc_id" % 7 === 0,
            concat(lit(" call "), $"doc_id" % 700 + 200, lit("-"),
              $"doc_id" % 600 + 300, lit("-"),
              $"doc_id" % 8000 + 2000)).otherwise(""))
          .as("text"))
      graft.operators.TextAnalysis.redactPii(docs)
        .select($"doc_id", $"n_emails", $"n_ssns", $"n_phones",
          $"n_ips", $"redacted")
        .orderBy($"doc_id")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' email user' || CAST(doc_id AS VARCHAR)
                            || '@ex' || CAST(doc_id % 5 AS VARCHAR)
                            || '.org'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' ip ' || CAST(doc_id % 254 + 1 AS VARCHAR)
                            || '.' || CAST(doc_id % 200 + 3 AS VARCHAR)
                            || '.' || CAST(doc_id % 100 AS VARCHAR)
                            || '.' || CAST(doc_id % 50 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR)
                            || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)
                            || '-' || CAST(doc_id % 9000 + 1000
                                           AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call ' || CAST(doc_id % 700 + 200
                                             AS VARCHAR)
                            || '-' || CAST(doc_id % 600 + 300 AS VARCHAR)
                            || '-' || CAST(doc_id % 8000 + 2000
                                           AS VARCHAR)
                       ELSE '' END AS text
        FROM documents
      )
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text,
               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssns,
             CAST(len(regexp_extract_all(text,
               '\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b')) AS INT)
               AS n_phones,
             CAST(len(regexp_extract_all(text,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS INT) AS n_ips,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                   '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
                 '\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b', '<PHONE>',
                 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g') AS redacted
      FROM docs
      ORDER BY doc_id"""))

  /** Sequence packing end-to-end — Curation.packSequences: whitespace
    * token counts, global exclusive prefix-sum offsets in doc_id order
    * (the distributed zipWithIndex shape — no single-partition window),
    * and the fixed 512-token context span each document occupies. */
  val q86 = Q(
    "q86_sequence_packing",
    (s, d) => {
      import s.implicits._
      graft.operators.Curation.packSequences(t(s, d, "documents"),
        "doc_id", size(graft.operators.TextAnalysis.tokens($"text")),
        512)
        .select($"doc_id", $"n_tokens", $"token_offset",
          $"chunk_start", $"chunk_end")
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
      ), o AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS token_offset
        FROM t
      )
      SELECT doc_id, n_tokens, token_offset,
             token_offset // 512 AS chunk_start,
             CASE WHEN n_tokens > 0
                  THEN (token_offset + n_tokens - 1) // 512
                  ELSE token_offset // 512 END AS chunk_end
      FROM o ORDER BY doc_id"""))

  /** A1/A2 end-to-end — Prep.meanIbIntensity + totalIbIntensity
    * (Prep.scala:90,96, reference samples.py:1044-1072): the in-band
    * cell extraction (type II reads (G, meth_g)/(R, unmeth_r); type I
    * reads both own-channel cells), per-(sample, probe) totals with the
    * 0→NULL rule, and the per-sample mean joined on. All integer
    * arithmetic plus one exact division. */
  val q87 = Q(
    "q87_ib_intensity",
    (s, d) => {
      import s.implicits._
      val sig = sigA(s, d)
      graft.prep.Prep.totalIbIntensity(sig)
        .join(graft.prep.Prep.meanIbIntensity(sig), Seq("sample_label"))
        .select($"sample_label", $"probe_id", $"total_ib",
          emit6($"mean_ib").as("mean_ib"))
        .orderBy($"sample_label", $"probe_id")
    },
    Some(s"""
      WITH sig AS ($sigSql
      ), ib AS (
        SELECT sample_label, probe_id,
               CASE WHEN inf_type = 'II' THEN 'G' ELSE channel END
                 AS ch,
               CASE WHEN inf_type = 'II' THEN meth_g
                    WHEN channel = 'G' THEN meth_g ELSE meth_r END AS v
        FROM sig WHERE inf_type = 'II' OR channel IN ('G', 'R')
        UNION ALL
        SELECT sample_label, probe_id,
               CASE WHEN inf_type = 'II' THEN 'R' ELSE channel END,
               CASE WHEN inf_type = 'II' THEN unmeth_r
                    WHEN channel = 'G' THEN unmeth_g ELSE unmeth_r END
        FROM sig WHERE inf_type = 'II' OR channel IN ('G', 'R')
      ), cells AS (
        SELECT * FROM ib WHERE v IS NOT NULL
      ), tot AS (
        SELECT sample_label, probe_id,
               CASE WHEN sum(CAST(v AS DOUBLE)) = 0 THEN NULL
                    ELSE sum(CAST(v AS DOUBLE)) END AS total_ib
        FROM cells GROUP BY sample_label, probe_id
      ), mn AS (
        SELECT sample_label, avg(CAST(v AS DOUBLE)) AS mean_ib
        FROM cells GROUP BY sample_label
      )
      SELECT t.sample_label, t.probe_id, t.total_ib,
             round(m.mean_ib, 6) + 0.0 AS mean_ib
      FROM tot t JOIN mn m USING (sample_label)
      ORDER BY sample_label, probe_id"""))

  /** L8 driver surface — Cnv.segment (Cnv.scala:325, reference
    * cnv.py:188-193 via the external linear_segment CBS): circular
    * binary segmentation over per-chromosome bin tracks with planted
    * gain plateaus. The permutation test (per-permutation
    * splitmix-seeded java.util.Random Fisher-Yates inside
    * data-dependent recursion) is NOT SQL-expressible — but the whole
    * pipeline is DETERMINISTIC end to end (seeded permutation pool,
    * ties by scan order; CnvSpec proves determinism under thread-pool
    * contention, PartitionInvarianceSpec at any shuffle setting), so
    * the oracle is the golden segment table itself as a literal
    * VALUES relation: emit6 makes every mean a 6-dp-exact double, the
    * bounds are exact integers, and any drift in the recursion,
    * p-value gate, or segment merge flips the hash. The fixture is
    * fixed: two chromosomes × 150 bins from `part` (min-anchored
    * p_partkey ≤ 300, so the golden table stays valid under id-shifted
    * seed rungs — present at sf ≥ 0.01; NOT valid at sf0.001 where
    * part has only 200 rows), cnv = ±small parity noise with a 0.9
    * plateau planted
    * on bins 50-99 of chr1 — CBS must find exactly
    * [2500000, 4950000]. */
  val q88 = Q(
    "q88_cnv_segmentation",
    (s, d) => {
      import s.implicits._
      val bins = Q.anchorKey(t(s, d, "part"), "p_partkey")
        .filter($"p_partkey" <= 300)
        .select(
          when($"p_partkey" % 2 === 0, "chr1").otherwise("chr2")
            .as("chrom"),
          (($"p_partkey" / 2) * 50000L).cast("long").as("map_loc"),
          (when($"p_partkey" % 4 < 2, 0.02).otherwise(-0.02) +
            when($"p_partkey" % 2 === 0 &&
              ($"p_partkey" / 2).between(50, 99), 0.9).otherwise(0.0))
            .as("cnv"))
      graft.cnv.Cnv.segment(s, bins, shuffles = 200,
        pThreshold = 0.01)
        .select($"chromosome", $"seg_id", $"start", $"end",
          $"nb_bins", emit6($"mean_cnv").as("mean_cnv"))
        .orderBy($"chromosome", $"seg_id")
    },
    Some("""
      SELECT chromosome, seg_id, "start", "end", nb_bins, mean_cnv
      FROM (VALUES
        ('chr1', CAST(0 AS INTEGER), CAST(0 AS BIGINT),
         CAST(2450000 AS BIGINT), CAST(50 AS INTEGER),
         CAST(0.0 AS DOUBLE)),
        ('chr1', CAST(1 AS INTEGER), CAST(2500000 AS BIGINT),
         CAST(4950000 AS BIGINT), CAST(50 AS INTEGER),
         CAST(0.9 AS DOUBLE)),
        ('chr1', CAST(2 AS INTEGER), CAST(5000000 AS BIGINT),
         CAST(7500000 AS BIGINT), CAST(51 AS INTEGER),
         CAST(0.000392 AS DOUBLE)),
        ('chr2', CAST(0 AS INTEGER), CAST(25000 AS BIGINT),
         CAST(7475000 AS BIGINT), CAST(150 AS INTEGER),
         CAST(0.0 AS DOUBLE))
      ) AS t(chromosome, seg_id, "start", "end", nb_bins, mean_cnv)
      ORDER BY chromosome, seg_id"""))

  /** L8 kernel gate — Cnv.bestArcs over q88's exact fixture: the CBS
    * arc-statistic argmax (the deterministic core the permutation test
    * wraps) carries a full EXACT oracle. Prefix sums accumulate
    * left-to-right in both engines, each (i, j) candidate's t uses the
    * identical operation order, ties resolve (t DESC, i, j) = the
    * kernel's first-maximum scan order. The integer arc bounds are the
    * hash-gate teeth; q88 stays rows-only for the full recursion. */
  val q95 = Q(
    "q95_cbs_arc_stat",
    (s, d) => {
      import s.implicits._
      val bins = Q.anchorKey(t(s, d, "part"), "p_partkey")
        .filter($"p_partkey" <= 300)
        .select(
          when($"p_partkey" % 2 === 0, "chr1").otherwise("chr2")
            .as("chrom"),
          (($"p_partkey" / 2) * 50000L).cast("long").as("map_loc"),
          (when($"p_partkey" % 4 < 2, 0.02).otherwise(-0.02) +
            when($"p_partkey" % 2 === 0 &&
              ($"p_partkey" / 2).between(50, 99), 0.9).otherwise(0.0))
            .as("cnv"))
      graft.cnv.Cnv.bestArcs(s, bins)
        .select($"chromosome", $"n_bins",
          emit6($"best_t").as("best_t"),
          $"arc_start", $"arc_end",
          emit6($"arc_mean").as("arc_mean"),
          emit6($"rest_mean").as("rest_mean"))
        .orderBy($"chromosome")
    },
    Some("""
      WITH pt AS (
        SELECT p_partkey - (SELECT min(p_partkey) FROM part)
                 AS p_partkey
        FROM part
      ), bins AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN 'chr1' ELSE 'chr2' END
                 AS chrom,
               CAST(p_partkey * 25000 AS BIGINT) AS map_loc,
               (CASE WHEN p_partkey % 4 < 2 THEN 0.02 ELSE -0.02 END +
                CASE WHEN p_partkey % 2 = 0
                      AND p_partkey BETWEEN 100 AND 198
                     THEN 0.9 ELSE 0.0 END) AS cnv
        FROM pt WHERE p_partkey <= 300
      ), ord AS (
        SELECT chrom, cnv,
               row_number() OVER (PARTITION BY chrom ORDER BY map_loc)
                 AS r
        FROM bins
      ), nn AS (SELECT chrom, count(*) AS n FROM ord GROUP BY 1),
      pre AS (
        SELECT chrom, r AS k,
               sum(cnv) OVER (PARTITION BY chrom ORDER BY r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM ord
      ), ps AS (
        SELECT chrom, 0 AS k, 0.0 AS s FROM nn
        UNION ALL SELECT chrom, k, s FROM pre
      ), tt AS (
        SELECT p.chrom, p.s AS total
        FROM ps p JOIN nn ON p.chrom = nn.chrom AND p.k = nn.n
      ), scored AS (
        SELECT a.chrom, a.k AS i, b.k AS j, b.k - a.k AS m, nn.n,
               b.s - a.s AS arc, tt.total,
               abs((b.s - a.s) / (b.k - a.k)
                   - (tt.total - (b.s - a.s)) / (nn.n - (b.k - a.k)))
                 * sqrt(CAST(b.k - a.k AS DOUBLE)
                        * (nn.n - (b.k - a.k)) / nn.n) AS t
        FROM ps a
        JOIN ps b ON a.chrom = b.chrom AND b.k > a.k
        JOIN nn ON nn.chrom = a.chrom
        JOIN tt ON tt.chrom = a.chrom
        WHERE b.k - a.k < nn.n
      ), best AS (
        SELECT *, row_number() OVER (PARTITION BY chrom
          ORDER BY t DESC, i, j) AS rn
        FROM scored
      )
      SELECT chrom AS chromosome, CAST(n AS BIGINT) AS n_bins,
             round(t, 6) + 0.0 AS best_t,
             CAST(i AS BIGINT) AS arc_start,
             CAST(j AS BIGINT) AS arc_end,
             round(arc / m, 6) + 0.0 AS arc_mean,
             round((total - arc) / (n - m), 6) + 0.0 AS rest_mean
      FROM best WHERE rn = 1
      ORDER BY chromosome"""))

  val all: Seq[Q] =
    Seq(q74, q75, q76, q77, q78, q79, q80, q81, q82, q83, q84, q85,
      q86, q87, q88, q95)
}
