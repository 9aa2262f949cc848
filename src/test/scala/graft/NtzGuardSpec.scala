package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression guard for the r6 environment drift: `events.parquet`
  * regenerated as TIMESTAMP(MICROS) with `isAdjustedToUTC=false` surfaces
  * as TIMESTAMP_NTZ under default inference and broke every
  * `unix_micros(ts)` call site. This spec plants an explicitly-NTZ events
  * fixture and proves the ingestion boundary ([[Q.eventTs]] / [[Q.t]])
  * normalizes it so event-time operators still analyze — if a future
  * drift reintroduces the breakage, this fails loudly instead of oracle
  * rows silently vanishing. */
class NtzGuardSpec extends SparkSpec {

  test("events ingestion is NTZ-proof: unix_micros analyzes on an NTZ fixture") {
    val dir = java.nio.file.Files.createTempDirectory("ntz").toString
    // Plant a fixture whose on-disk ts is µs-without-timezone: writing a
    // TIMESTAMP_NTZ column produces exactly the isAdjustedToUTC=false
    // parquet the regenerated testdata carries.
    Q.t(spark, sf("sf0.001"), "events").limit(100)
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")

    // Read it the way the drifted environment did: NTZ inference ON.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == TimestampNTZType,
        "fixture must actually surface as NTZ for this guard to bite")
      // unix_micros is the exact call that failed analysis in r6
      val norm = Q.eventTs(raw)
      assert(norm.schema("ts").dataType == TimestampType)
      assert(norm.select(unix_micros(col("ts"))).count() == 100)
      // the table-loading boundary itself must be NTZ-proof too
      assert(Q.t(spark, dir, "events").schema("ts").dataType == TimestampType)
    } finally
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

    // Instants must agree between the config path (inference off → LTZ)
    // and the cast path (NTZ → LTZ in the UTC session): same µs values.
    val viaConfig = Q.t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val viaCast = Q.eventTs(spark.read.parquet(s"$dir/events.parquet"))
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      assert(viaConfig.except(viaCast).isEmpty &&
        viaCast.except(viaConfig).isEmpty)
    } finally
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  test("events ingestion normalizes ISO-8601 STRING timestamps too") {
    val dir = java.nio.file.Files.createTempDirectory("tstr").toString
    val base = Q.t(spark, sf("sf0.001"), "events").limit(100)
    base
      .withColumn("ts",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .write.parquet(s"$dir/events.parquet")
    val norm = Q.t(spark, dir, "events")
    assert(norm.schema("ts").dataType == TimestampType)
    // same instants as the native-timestamp read (UTC session)
    val want = base.select(col("event_id"),
      unix_micros(col("ts")).as("us"))
    val got = norm.select(col("event_id"),
      unix_micros(col("ts")).as("us"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
