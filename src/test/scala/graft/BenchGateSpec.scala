package graft

import org.apache.spark.sql.DataFrame

/** CI-time plan-shape gate: the registry's heaviest queries (per the
  * round-9 driver bench) each run ONCE at sf0.01 under a wall ceiling
  * ≈ 10× their healthy single-shot time on this box. The point is not
  * timing precision — it is catching an accidentally quadratic or
  * collect-shaped plan at `sbt test` time instead of in the next
  * round's driver bench: a planted all-pairs join on `documents` at
  * sf0.01 blows these ceilings by an order of magnitude, while
  * scheduler weather stays well inside them.
  */
class BenchGateSpec extends SparkSpec {

  private val SfDir = sf("sf0.01")

  /** (query, ceiling seconds): ceilings are ~10-20× the measured
    * healthy sf0.01 single-shot wall (first run in a fresh suite JVM,
    * codegen included) — loose enough for CI noise, tight enough that
    * an O(n²) regression cannot hide. The heavy-pipeline ceilings are
    * 120 s, not 60: `sbt test` runs SUITES in parallel inside the
    * forked JVM, so these walls include contention from whichever
    * heavy suites overlap them — measured up to 68 s for q81 in a
    * slow-host window (r11) with an unchanged plan, while a planted
    * all-pairs join still lands in the many-minute range. */
  private val gates = Seq(
    "q59_poobah_slice" -> 120.0,
    "q63_noob_endtoend" -> 120.0,
    "q71_dmr_endtoend" -> 120.0,
    "q81_dmp_mixedlm_endtoend" -> 120.0,
    "q67_dmp_ols_endtoend" -> 60.0,
    "q148_leakage_safe_split" -> 60.0,
    "q156_neardup_pipeline" -> 60.0)

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, SfDir)

  gates.foreach { case (name, ceiling) =>
    test(s"$name completes sf0.01 under ${ceiling.toInt}s") {
      val t0 = System.nanoTime()
      val n = run(name).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // q59-class queries persist internally
      info(f"$name: $sec%.1f s at sf0.01 (ceiling ${ceiling.toInt}s)")
      assert(n > 0, s"$name returned no rows at sf0.01")
      assert(sec < ceiling,
        f"$name took $sec%.1f s at sf0.01 (ceiling $ceiling%.0f s) — " +
          "plan regression (quadratic join / lost pushdown / " +
          "collect boundary)?")
    }
  }
}
