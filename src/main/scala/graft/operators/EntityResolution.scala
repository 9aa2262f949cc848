package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-based entity resolution (Fellegi & Sunter 1969; the
  * Dedoop/record-linkage standard): candidate pairs come only from
  * records sharing a BLOCKING KEY, so the pair expansion is
  * Σ_blocks |b|² instead of n² — the same df²-bounding idea as the
  * dedup family's dfCap, applied to structured records instead of
  * shingles. Callers score the emitted pairs with field-agreement
  * weights and threshold.
  *
  * Scale: ONE equi self-join on the block key (hash shuffle both
  * sides). The failure mode is a hot block (a city, a default
  * segment) going quadratic — `maxBlock` drops oversize blocks the
  * way dfCap drops hot shingles (standard ER practice: oversize
  * blocks are re-blocked on a finer key in a later pass, and
  * multi-pass unions catch pairs a dropped block missed). */
object EntityResolution {

  /** Within-block ordered pairs: every record pair sharing the full
    * `blockCols` key, with `idCol`(a) < `idCol`(b). Non-block columns
    * are emitted twice with `a_`/`b_` prefixes; block columns once,
    * unprefixed. `maxBlock` caps block cardinality (None = uncapped). */
  def blockedPairs(df: DataFrame, blockCols: Seq[String], idCol: String,
      maxBlock: Option[Int] = None): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    val capped = maxBlock match {
      case Some(cap) =>
        // block census shares the join's hash partitioning — the
        // window reuses the exchange, no extra shuffle
        import org.apache.spark.sql.expressions.Window
        df.withColumn("__bn", count(lit(1)).over(
            Window.partitionBy(blockCols.map(col): _*)))
          .filter(col("__bn") <= cap).drop("__bn")
      case None => df
    }
    val payload = df.columns.filterNot(blockCols.contains).toSeq
    val a = capped.select(blockCols.map(col) ++
      payload.map(c => col(c).as(s"a_$c")): _*)
    val b = capped.select(blockCols.map(col) ++
      payload.map(c => col(c).as(s"b_$c")): _*)
    a.join(b, blockCols).filter(col(s"a_$idCol") < col(s"b_$idCol"))
  }
}
