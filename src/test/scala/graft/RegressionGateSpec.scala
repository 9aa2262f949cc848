package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Driver-hash-faithful regression gate IN CI: runs a handful of
  * registry queries exactly the way the round driver does (Verify-style
  * parquet dump + `tools/check_oracle.py`'s STRICT DuckDB compare), so
  * an oracle-typing or ordering divergence fails `sbt test` instead of
  * shipping red in the driver report. The q71 HUGEINT bug survived
  * THREE rounds because the old local checker coerced `4 == 4.0`; this
  * spec is the permanent guard against that class.
  *
  * The picked queries cover the classes that have actually burned:
  *   - q57  betas pivot — NULLS FIRST/LAST tie-order class
  *   - q71  DMR segmentation — `sum() OVER` HUGEINT typing class
  *   - q107 URL dedup — paired Spark/DuckDB canonicalization spellings
  *   - q118 MERGE upsert — full-outer coalesce semantics
  *   - q129 cumulative growth — windowed `sum()` HUGEINT class
  *
  * Needs python3 + duckdb (present on the round driver and dev boxes);
  * cancels, not fails, where they're missing so `sbt test` stays
  * runnable in a bare JVM-only environment.
  */
class RegressionGateSpec extends SparkSpec {

  private val picked = Seq("q57_betas", "q71_dmr", "q107_url_dedup",
    "q118_merge_upsert", "q129_user_growth")

  test("strict DuckDB-oracle compare on representative queries " +
      "(driver-faithful: in-order columns, dtype-strict, no coercion)") {
    val duckOk = Process(Seq("python3", "-c", "import duckdb,pandas"))
      .run(ProcessLogger(_ => ())).exitValue() == 0
    assume(duckOk, "python3+duckdb unavailable — gate runs driver-side")

    val sfDir = sf("sf0.001")
    val out = Files.createTempDirectory("graft_gate_").toString
    val names = SparkEntry.queries.keys
      .filter(n => picked.exists(n.startsWith)).toSeq.sorted
    assert(names.size == picked.size,
      s"picked queries drifted from the registry: got $names")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
    }
    Files.writeString(Paths.get(s"$out/oracle_sql.json"),
      Verify.oracleJson(SparkEntry.oracleSql))

    val buf = new StringBuilder
    val code = Process(
      Seq("python3", "tools/check_oracle.py", sfDir, out) ++ names,
      new java.io.File(".")).run(
        ProcessLogger(l => buf.append(l).append('\n'))).exitValue()
    assert(code == 0, s"strict oracle compare failed:\n$buf")
    assert(buf.toString.contains(s"${names.size} pass, 0 fail"), buf)
  }
}
