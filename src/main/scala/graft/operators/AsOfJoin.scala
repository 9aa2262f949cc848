package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, attach the most recent
  * right row at or before the left row's time, matched on equi keys.
  *
  * The reference has no as-of surface (its interval ops are pyranges
  * overlaps, SURVEY.md §2.4); this is a training-data-pipeline operator:
  * "state as of event time" lookups (latest model checkpoint before a
  * sample, last purchase before a click, most recent label before a
  * snapshot).
  *
  * Scale design: the naive formulation is a non-equi join
  * (`l.key = r.key AND r.ts < l.ts` + argmax) that Catalyst can only plan
  * as a shuffled join with per-row scans of the right group — quadratic in
  * hot keys. This implementation instead union-tags both sides, shuffles
  * ONCE on the equi keys, sorts each key group by `(ts, side)` and
  * carries the right row's payload forward with
  * `last(_, ignoreNulls).over(unboundedPreceding → currentRow)` — a single
  * linear window pass, no join at all. At 100 TB this is one shuffle of
  * left+right and a sort, the same cost as the sort-merge join Catalyst
  * would need anyway, with no quadratic residual.
  *
  * Strictness: `strict = true` matches `r.ts < l.ts` (right rows at the
  * exact left timestamp are NOT visible); `false` matches `r.ts <= l.ts`.
  * Implemented purely by the side ordering at equal timestamps.
  *
  * Determinism: if several right rows share the same `(keys, ts)`, which
  * one is "last" is tie-broken by `rightTieBreak` (pass e.g. a unique id);
  * with no tie-break the caller must pre-aggregate the right side to one
  * row per `(keys, ts)` — the oracle-checked q43 does exactly that.
  *
  * Semantics are LEFT OUTER: left rows with no prior right row keep null
  * payload columns (filter them for inner as-of).
  */
object AsOfJoin {

  /** @param keys       equi-join key columns (present on both sides)
    * @param leftTs     left event-time column name
    * @param rightTs    right event-time column name
    * @param rightCols  right payload columns to carry; each appears in the
    *                   output as `prefix + name`, plus `prefix + rightTs`
    *                   (the matched row's time)
    * @param rightTieBreak extra right-side ordering columns for equal
    *                   timestamps (ascending; the LAST row wins)
    * @param tolerance  optional staleness gate (pandas
    *                   `merge_asof(tolerance=...)`): a predicate over
    *                   (left ts, matched right ts) — when it returns
    *                   false the match is DISCARDED (null payload, row
    *                   kept). Evaluated row-locally after the forward
    *                   fill; adds nothing to the shuffle.
    * @param direction  pandas `merge_asof(direction=...)`: "backward"
    *                   (default — most recent right row at/before the
    *                   left time), "forward" (first right row at/after),
    *                   or "nearest" (closer of the two candidates, gated
    *                   per-candidate by `tolerance`, ties broken backward
    *                   like pandas). All three run in the SAME single
    *                   union-tag shuffle: forward is the mirrored carry
    *                   (`first` over currentRow→following), nearest
    *                   evaluates both frames in one WindowExec (same
    *                   partitioning and ordering) and picks row-locally.
    *                   "nearest" requires `strict = false`: exact-time
    *                   matches surface through the backward frame at
    *                   distance zero (pandas' allow_exact_matches=True).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      strict: Boolean = true, prefix: String = "asof_",
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[(Column, Column) => Column] = None,
      direction: String = "backward"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(direction != "nearest" || !strict,
      "direction=nearest requires strict=false (exact matches allowed)")
    val ts = "__asof_ts"
    val side = "__asof_side"
    val tie = "__asof_tie"
    // Internal scratch columns and the prefixed output columns would
    // silently overwrite (and then drop) same-named input columns.
    val internal = Seq(ts, side, tie, "__asof_payload")
    val clashes = (left.columns ++ right.columns).filter(internal.contains)
    require(clashes.isEmpty,
      s"input columns collide with AsOfJoin internals: ${clashes.mkString(", ")}")
    val outClashes = (rightTs +: rightCols).map(prefix + _)
      .filter(left.columns.contains)
    require(outClashes.isEmpty,
      s"left columns collide with prefixed output columns " +
        s"${outClashes.mkString(", ")}; pass a different prefix")
    // Side ordering encodes strictness: for backward fills (frame ending
    // at currentRow) an equal-ts right row is visible iff it sorts BEFORE
    // the left row; for forward fills (frame starting at currentRow) iff
    // it sorts AFTER. "nearest" uses the backward-inclusive ordering —
    // the forward frame then misses equal-ts rights, which is harmless
    // because the backward candidate already matches them at distance 0.
    val (leftSide, rightSide) = direction match {
      case "forward" => if (strict) (1, 0) else (0, 1)
      case _         => if (strict) (0, 1) else (1, 0)
    }

    // All carried columns travel in ONE struct so the forward-fill cannot
    // mix fields from different right rows: a right row with a null payload
    // column still produces a non-null struct, and last(ignoreNulls) picks
    // the whole most-recent row atomically.
    val payload = "__asof_payload"
    val carried = (rightTs +: rightCols).map(c => prefix + c)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as(ts), lit(rightSide).as(side),
          struct(col(rightTs).as(prefix + rightTs) +:
            rightCols.map(c => col(c).as(prefix + c)): _*).as(payload)) ++
        Seq((if (rightTieBreak.isEmpty) lit(0)
             else struct(rightTieBreak.map(col): _*)).as(tie)): _*)
    val l = left.withColumn(ts, col(leftTs))
      .withColumn(side, lit(leftSide))
      .withColumn(tie, lit(null).cast(r.schema(tie).dataType))
      .withColumn(payload, lit(null).cast(r.schema(payload).dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(tie).asc)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val gated = direction match {
      case "backward" | "forward" =>
        val fill = if (direction == "backward")
          last(col(payload), ignoreNulls = true).over(wBack)
        else first(col(payload), ignoreNulls = true).over(wFwd)
        val filled = unioned.withColumn(payload, fill)
        tolerance.fold(filled) { within =>
          filled.withColumn(payload,
            when(within(col(ts), col(payload)(prefix + rightTs)),
              col(payload)))
        }
      case "nearest" =>
        // Both frames share partitioning + ordering → ONE WindowExec,
        // each fill computed once, then a row-local projection picks.
        // Tolerance gates each candidate BEFORE the choice (pandas:
        // nearest within tolerance); the timestamp distance compares as
        // double (seconds for timestamps, the raw value for numerics).
        def gate(p: Column): Column = tolerance.fold(p)(within =>
          when(within(col(ts), p(prefix + rightTs)), p))
        val bc = "__asof_bwd"
        val fc = "__asof_fwd"
        val twoFills = unioned
          .withColumn(bc, last(col(payload), ignoreNulls = true).over(wBack))
          .withColumn(fc, first(col(payload), ignoreNulls = true).over(wFwd))
        val b = gate(col(bc))
        val f = gate(col(fc))
        val bDist =
          abs(col(ts).cast("double") - b(prefix + rightTs).cast("double"))
        val fDist =
          abs(col(ts).cast("double") - f(prefix + rightTs).cast("double"))
        twoFills.withColumn(payload,
            when(b.isNotNull && (f.isNull || bDist <= fDist), b).otherwise(f))
          .drop(bc, fc)
    }
    carried.foldLeft(gated.filter(col(side) === leftSide)) { (df, c) =>
      df.withColumn(c, col(payload)(c))
    }.drop(ts, side, tie, payload)
  }
}
