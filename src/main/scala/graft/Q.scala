package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered engine query: a Spark implementation over the driver's
  * parquet tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *   - every output column is explicitly aliased, identically on both sides;
  *   - every query ends with a total ORDER BY (all output columns or a key
  *     that is unique) so row order is identical on both sides;
  *   - floating-point aggregates are wrapped in round(x, k) on both sides so
  *     accumulation-order last-bit drift cannot flip the hash.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Load one of the driver-generated parquet tables from an sf dir.
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 cannot map to
    * its µs TimestampType directly; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong` and we convert here (the data
    * is µs-grained, so `div 1000` is exact — same instants DuckDB sees). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Session configs every entry point (Verify/Bench/tests) applies. */
  val sessionConfigs: Map[String, String] = Map(
    // the full deployment surface: SQL kernels + the overlap-join
    // rewrite rule, injected the way a cluster would
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    // Coalesce post-shuffle partitions to the advisory size instead of
    // maximizing parallelism: at 100 TB both settings land on ~64 MB
    // partitions; on small inputs parallelismFirst=true (the default)
    // schedules one micro-task per core per stage — pure overhead. The
    // Spark tuning guide itself recommends false for busy clusters.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    // Wrap-around 64-bit arithmetic (MinHash affine rehash, fingerprints)
    // needs Java semantics, not ANSI overflow errors:
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC")
}
