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
  /** Normalize an `events`-shaped frame's `ts` column to TIMESTAMP_LTZ,
    * whatever flavor the lakehouse delivered it in. Real corpora mix all
    * three: TIMESTAMP(NANOS) parquet read as Long under
    * `legacy.parquet.nanosAsLong` (µs-grained, so `div 1000` is exact),
    * TIMESTAMP(MICROS) with `isAdjustedToUTC=false` read as TIMESTAMP_NTZ
    * (the cast interprets wall-clock in the session zone — pinned to UTC
    * in [[sessionConfigs]], the same instants DuckDB sees), and plain
    * TIMESTAMP_LTZ which passes through. Event-time operators downstream
    * (`unix_micros`, watermarks, RANGE frames) all require LTZ. */
  def eventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case Some(StringType) =>
        // CSV-ish landing zones deliver ISO-8601 strings; the cast
        // parses wall-clock in the session zone (UTC), like NTZ
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Load one of the driver-generated parquet tables from an sf dir;
    * `events.ts` is normalized via [[eventTs]].
    *
    * The resolved PLAN is memoized per (session, path): every
    * `spark.read.parquet` pays ~30-40 ms of driver-side DataSource
    * resolution (file listing + parquet footer/schema inference), and
    * the registry re-reads the same handful of immutable tables
    * hundreds of times per bench pass — r16 DriverProfile measured
    * ~0.07-0.15 s of pure construction time per sub-second query, the
    * single largest driver-overhead component. The memo holds the lazy
    * DataFrame (logical plan + file index + schema), NEVER results:
    * every action still scans parquet. This is the same metadata reuse
    * a catalog table gives for free (guide §6 file-listing caches);
    * sharing one plan object across queries is the ordinary self-join
    * shape DeduplicateRelations handles. Keyed weakly on the session
    * so test sessions don't pin plans after stop(). */
  private val readMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val per = readMemo.synchronized {
      var m = readMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]
        readMemo.put(spark, m)
      }
      m
    }
    per.computeIfAbsent(s"$dir/$name.parquet", p => {
      val df = spark.read.parquet(p)
      if (name == "events") eventTs(df) else df
    })
  }

  /** Shift-invariant fixture key: rewrite `key` to `key − min(key)`
    * (one-row broadcast join — `df` itself never shuffles). Fixture
    * queries that derive synthetic structures from a base table's key
    * VALUES (parities, ranges, grids) anchor on the observed minimum
    * so the construction — and therefore its oracle — is invariant
    * under uniform id translation, the transformation SeedPerturb's
    * alternate-seed rungs apply. On the driver fixture every key
    * starts at 0, so this is the identity there (r15: before
    * anchoring, 14 registry queries silently went EMPTY on
    * key-shifted data — q36/q88 red, the rest vacuously green). */
  def anchorKey(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, min}
    df.crossJoin(broadcast(df.select(min(col(key)).as("_graft_key_min"))))
      .withColumn(key, col(key) - col("_graft_key_min"))
      .drop("_graft_key_min")
  }

  /** Session configs every entry point (Verify/Bench/tests) applies. */
  val sessionConfigs: Map[String, String] = Map(
    // the full deployment surface: SQL kernels + the overlap-join
    // rewrite rule, injected the way a cluster would
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // TIMESTAMP(MICROS) parquet with isAdjustedToUTC=false would otherwise
    // surface as TIMESTAMP_NTZ and break every event-time operator
    // (unix_micros, watermarks). Read it as LTZ; Q.eventTs additionally
    // makes the events boundary NTZ-proof regardless of this config.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true",
    // r16: the janino codegen cache defaults to 100 compiled classes —
    // sized for a handful of hot queries, not an engine with 178
    // registered shapes (~1500+ codegen units incl. expression-level
    // UnsafeProjection/ordering/predicate classes). At 100 entries the
    // LRU thrashes: every AQE stage recompiles its fragment on the
    // driver (~10-40 ms, measured as the per-job scheduling gap) and
    // every task-side expression class recompiles on first use.
    // DriverProfile A/B on a 16-query subset: wall 29.3 -> 21.5 s.
    // 4096 entries covers the registry with headroom; generated classes
    // are KB-sized so the bound stays far under metaspace pressure. A
    // long-lived production cluster serving a wide query mix wants the
    // same (static conf, driver+executor JVM-local).
    "spark.sql.codegen.cache.maxEntries" -> "4096",
    // r16: InferFiltersFromGenerate synthesizes `size(x) > 0 AND
    // isnotnull(x)` under every explode, and predicate pushdown then
    // SUBSTITUTES the generator input's alias chain while pushing that
    // filter through projections and joins — re-deriving arbitrarily
    // expensive array expressions below the query's own selective
    // filters. Measured on q162: the energyProfile64(transform(...))
    // chain re-evaluated TWICE for all 20k scan rows inside a join
    // condition (1.4 s) instead of once for the 61 filtered rows;
    // excluding the rule took q162 1.48 -> 0.23 s with every other
    // explode query flat (DriverProfile A/B, 14-query explode subset).
    // The rule's upside — dropping empty-array rows before a shuffle
    // that precedes the explode — never applies here: every operator
    // explodes row-locally BEFORE its first shuffle (the narrow-rows
    // design rule), so the Generate drops those rows at the same stage
    // anyway. Same trade at 100 TB: the substitution cost scales with
    // the scan, the pruning benefit with rows a shuffle would carry.
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    // r15: parallelismFirst back to TRUE (the Spark default). With
    // `false`, AQE coalesces every post-shuffle stage to the 64 MB
    // advisory REGARDLESS of its CPU cost — measured this round
    // squeezing the byte-small/CPU-heavy fit stages onto ONE task
    // (q81's per-probe LMM fits: a 5.1 s single-task stage; q63's
    // Huber gather: 3.7 s; q84's pivot+betas chain: 2.9 s across three
    // single-task stages). With `true`, coalescing targets parallelism
    // first and still never creates partitions under
    // coalescePartitions.minPartitionSize (1 MB), so genuinely tiny
    // exchanges still collapse to one task; at 100 TB post-shuffle
    // stages are orders of magnitude over the advisory and the two
    // settings plan identically — the flag only matters exactly where
    // the old value was wrong.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
    // Joins (guide §3.1/§9): let the planner pick a shuffled-hash join
    // instead of sort-merge when the build side fits — both sides of the
    // pipelines' key-aligned joins (p-value tables, size tables, per-key
    // aggregates) are hash-partitioned already, and SMJ was paying a full
    // sort of BOTH sides per join (q59: two 600k-row string-key sorts in
    // the final stage). Static selection stays size-gated by the
    // planner's own muchSmaller/fits-local-map conditions; the AQE knob
    // additionally rewrites SMJ→SHJ at runtime only when EVERY
    // post-shuffle partition is under the per-partition bound, so at
    // 100 TB a build side that does not fit per-partition keeps
    // sort-merge — the safety property is per-partition and
    // runtime-measured, not an estimate.
    "spark.sql.join.preferSortMergeJoin" -> "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64MB",
    // Wrap-around 64-bit arithmetic (MinHash affine rehash, fingerprints)
    // needs Java semantics, not ANSI overflow errors:
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC")
}
