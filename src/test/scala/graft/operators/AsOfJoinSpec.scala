package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AsOfJoin.asOf vs a brute-force non-equi reference (join all earlier
  * right rows, keep the argmax) — strict and inclusive semantics, equal
  * timestamps, left rows with no match, multiple keys interleaved, and
  * the tie-break between right rows at the same timestamp. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, lts, lid) — right: (key, rts, payload)
  private lazy val left = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
    ("b", 10L, 4L), ("b", 15L, 5L),
    ("c", 5L, 6L) // no right rows for key c at all
  ).toDF("k", "lts", "lid")

  private lazy val right = Seq(
    ("a", 10L, 100.0), ("a", 25L, 200.0),
    ("b", 12L, 300.0)
  ).toDF("k", "rts", "payload")

  /** Brute-force reference: for each left row, all right rows passing the
    * time predicate, argmax by rts. */
  private def reference(strict: Boolean) = {
    val pred = if (strict) $"rts" < $"lts" else $"rts" <= $"lts"
    left.join(right, left("k") === right("k") && pred, "left")
      .groupBy(left("k").as("k"), $"lts", $"lid")
      .agg(max(struct($"rts", $"payload")).as("m"))
      .select($"k", $"lts", $"lid",
        $"m.rts".as("asof_rts"), $"m.payload".as("asof_payload"))
  }

  test("strict as-of equals brute-force argmax (rts < lts)") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
        Seq("payload"), strict = true)
      .select($"k", $"lts", $"lid", $"asof_rts", $"asof_payload")
    val want = reference(strict = true)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the equal-timestamp right row (a,10) must NOT match left (a,10)
    val row = got.filter($"lid" === 1L).collect().head
    assert(row.isNullAt(row.fieldIndex("asof_rts")))
  }

  test("inclusive as-of equals brute-force argmax (rts <= lts)") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
        Seq("payload"), strict = false)
      .select($"k", $"lts", $"lid", $"asof_rts", $"asof_payload")
    val want = reference(strict = false)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val row = got.filter($"lid" === 1L).collect().head
    assert(row.getLong(row.fieldIndex("asof_rts")) === 10L)
  }

  test("left rows keep all their columns and count") {
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
      Seq("payload"))
    assert(got.count() === left.count())
    assert(Seq("k", "lts", "lid", "asof_rts", "asof_payload")
      .forall(got.columns.contains))
  }

  test("null payload in the newest right row is NOT backfilled from older rows") {
    // right rows: (ts=10, x=1.0, y=7.0) then (ts=25, x=null, y=9.0).
    // A left row at ts=30 must see the ts=25 row atomically:
    // asof_x = null (not 1.0 leaked from ts=10), asof_y = 9.0.
    val r2 = Seq(
      ("a", 10L, Option(1.0), Option(7.0)),
      ("a", 25L, Option.empty[Double], Option(9.0))
    ).toDF("k", "rts", "x", "y")
    val got = AsOfJoin.asOf(left.filter($"lid" === 3L), r2, Seq("k"),
      "lts", "rts", Seq("x", "y")).collect().head
    assert(got.getLong(got.fieldIndex("asof_rts")) === 25L)
    assert(got.isNullAt(got.fieldIndex("asof_x")))
    assert(got.getDouble(got.fieldIndex("asof_y")) === 9.0)
  }

  test("tolerance discards stale matches but keeps the left row") {
    // long ts columns: tolerance predicate is plain arithmetic
    val got = AsOfJoin.asOf(left, right, Seq("k"),
        leftTs = "lts", rightTs = "rts", rightCols = Seq("payload"),
        tolerance = Some((l, r) => l - r <= 5L))
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Double]("asof_payload"))).toMap
    // a@20: match rts=10 is 10 old > 5 → discarded; a@30: rts=25 is 5
    // old → kept; b@15: rts=12 is 3 old → kept; c: never matched
    assert(got(1L).isEmpty)  // a@10 strict: rts=10 not < 10
    assert(got(2L).isEmpty)
    assert(got(3L).contains(200.0))
    assert(got(5L).contains(300.0))
    assert(got(6L).isEmpty)
    // every left row survives regardless of tolerance
    assert(got.size == 6)
  }

  test("rightTieBreak picks the highest tie-break row at equal ts") {
    val dupRight = Seq(
      ("a", 10L, 1L, 111.0), ("a", 10L, 2L, 222.0)
    ).toDF("k", "rts", "rid", "payload")
    val got = AsOfJoin.asOf(
        left.filter($"lid" === 2L), dupRight, Seq("k"), "lts", "rts",
        Seq("payload"), rightTieBreak = Seq("rid"))
      .collect().head
    assert(got.getDouble(got.fieldIndex("asof_payload")) === 222.0)
  }

  /** Brute-force forward reference: argmin over rts passing the
    * predicate. */
  private def referenceFwd(strict: Boolean) = {
    val pred = if (strict) $"rts" > $"lts" else $"rts" >= $"lts"
    left.join(right, left("k") === right("k") && pred, "left")
      .groupBy(left("k").as("k"), $"lts", $"lid")
      .agg(min(struct($"rts", $"payload")).as("m"))
      .select($"k", $"lts", $"lid",
        $"m.rts".as("asof_rts"), $"m.payload".as("asof_payload"))
  }

  test("forward as-of equals brute-force argmin, both strictness modes") {
    for (strict <- Seq(true, false)) {
      val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
          Seq("payload"), strict = strict, direction = "forward")
        .select($"k", $"lts", $"lid", $"asof_rts", $"asof_payload")
      val want = referenceFwd(strict)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"forward strict=$strict")
    }
    // inclusive: left (a,10) matches right (a,10); strict: skips to (a,25)
    def at(strict: Boolean) = AsOfJoin.asOf(left.filter($"lid" === 1L),
        right, Seq("k"), "lts", "rts", Seq("payload"),
        strict = strict, direction = "forward")
      .collect().head.getAs[Long]("asof_rts")
    assert(at(strict = false) == 10L && at(strict = true) == 25L)
  }

  test("nearest as-of picks the closer side, ties backward, tolerance gates") {
    // a@10: bwd=10 (d=0) wins over fwd=25; a@20: bwd=10 (d=10) vs
    // fwd=25 (d=5) → forward wins; a@30: only bwd=25 (d=5);
    // b@15: bwd=12 (d=3), no fwd; c: nothing
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
        Seq("payload"), strict = false, direction = "nearest")
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rts")).map(_.toLong)).toMap
    assert(got(1L).contains(10L))
    assert(got(2L).contains(25L))
    assert(got(3L).contains(25L))
    assert(got(4L).contains(12L))
    assert(got(5L).contains(12L))
    assert(got(6L).isEmpty)
    // equidistant candidates break backward (pandas): lts=17 vs 12/22
    val tie = Seq(("b", 17L, 9L)).toDF("k", "lts", "lid")
    val r2 = Seq(("b", 12L, 1.0), ("b", 22L, 2.0)).toDF("k", "rts", "payload")
    val tgot = AsOfJoin.asOf(tie, r2, Seq("k"), "lts", "rts",
        Seq("payload"), strict = false, direction = "nearest")
      .collect().head
    assert(tgot.getLong(tgot.fieldIndex("asof_rts")) == 12L)
    // tolerance gates each side BEFORE the pick: a@20 with tol 4 has
    // bwd d=10 and fwd d=5 both out → null; tol 5 admits fwd only
    def tol(limit: Long) = AsOfJoin.asOf(left.filter($"lid" === 2L),
        right, Seq("k"), "lts", "rts", Seq("payload"),
        strict = false, direction = "nearest",
        tolerance = Some((l, r) => abs(l - r) <= limit))
      .collect().head
    assert(tol(4L).isNullAt(tol(4L).fieldIndex("asof_rts")))
    assert(tol(5L).getLong(tol(5L).fieldIndex("asof_rts")) == 25L)
  }

  test("nearest plans ONE window exchange (both frames share the sort)") {
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
        Seq("payload"), strict = false, direction = "nearest")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("- Window ")) == 1,
      s"expected a single WindowExec:\n$plan")
  }
}
