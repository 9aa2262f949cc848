package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate,
  Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType,
  IntegerType, LongType, ShortType}

/** Auto-rewrite of naive interval-overlap joins (SURVEY §4.3(3)).
  *
  * A user-written overlap join
  * {{{
  *   a.join(b, a("chrom") === b("chrom")
  *     && a("start") < b("end") && a("end") > b("start"))
  * }}}
  * has no usable high-cardinality equi key: with the chrom equality
  * Catalyst hash-joins on ~25 chromosome values (a skew/parallelism
  * ceiling — one task per chromosome at best, the largest chromosome
  * dominating), and without it the plan degenerates to a
  * broadcast-nested-loop / cartesian product. Code that calls
  * `Intervals.overlapJoin` gets the good binned plan; this rule gives
  * the SAME plan to the naive spelling, so the declarative form is
  * safe to write.
  *
  * Detection: an inner join whose condition contains (after conjunct
  * split) a `lX < rY` and a `lZ > rW` pair with integral operands —
  * the half-open overlap predicate `l.start < r.end && l.end >
  * r.start` in any orientation. Extra conjuncts (the chrom equality,
  * other residuals) are preserved untouched.
  *
  * Rewrite: both sides gain an exploded `bin` column covering
  * `start div B .. (end-1) div B` (B = spark.graft.overlapJoin.binSize,
  * default 100000), the join gains `bin_l = bin_r` — a real equi key
  * that hash/sort-merge partitions evenly — plus the one-bin dedup
  * predicate `bin_l = greatest(l_start, r_start) div B`: every truly
  * overlapping pair shares the bin containing the overlap's first
  * point and is emitted EXACTLY once, so no post-join dedup is needed
  * and output multiplicity matches the naive join bit-for-bit (the
  * original predicates all remain as residuals). A trailing Project
  * restores the original schema.
  *
  * Guards:
  *   - requires a NON-integral equality conjunct (the chromosome /
  *     partition key): that equality anchors the genomic-overlap shape.
  *     Two opposing inequalities alone are too weak a signal — they
  *     match unrelated predicate pairs whose bin ranges are unbounded.
  *   - skipped when the join already has an integral-typed equi key
  *     (either the caller pre-binned — `Intervals.overlapJoin` output —
  *     or a high-cardinality id equality already makes the join
  *     hash-joinable); rewriting there would stack pointless work.
  *     (A high-cardinality STRING equality cannot be distinguished from
  *     a chromosome key statically; such joins pay the bin explode
  *     without needing it — disable via the conf if that shape occurs.)
  *   - skipped on non-deterministic operands and non-integral bounds.
  *   - `spark.graft.overlapJoin.rewrite=false` disables globally.
  *
  * Degenerate intervals (`end <= start`) bin to `{start div B}` via the
  * `greatest` guard below, which keeps the rewrite faithful to the raw
  * predicate semantics: a pair satisfying the residual predicates is
  * emitted whether or not the "interval" is well-formed.
  *
  * Wide-interval safety (`spark.graft.overlapJoin.maxBinsPerRow`,
  * default 4096 → 409.6 Mb at the default bin size, wider than any
  * chromosome): a row whose bin range exceeds the cap — a sentinel
  * bound like `0 .. Long.MaxValue` would otherwise explode a
  * multi-billion-element Sequence (hard runtime failure past 2^31) —
  * is routed around the explode entirely. The plan becomes a union of
  * three branches with exactly-once semantics:
  *   1. normal × normal through the binned equi join (the hot path);
  *   2. long-left × all-right through the ORIGINAL condition;
  *   3. normal-left × long-right through the original condition.
  * Branches 2/3 carry a single-side `Filter`, so the long rows prune
  * before the join (a broadcast-nested-loop over the handful of
  * pathological rows — never an unfiltered cartesian). Set the cap
  * `<= 0` to restore the unbounded single-branch rewrite. The rule
  * recognises its own residual branches by those long-row filters
  * (semantic equality on a child conjunct) and leaves them alone —
  * the optimizer batch runs to fixed point, and without that guard
  * the residual joins still match the overlap shape.
  *
  * Every firing is logged at INFO (`RewriteOverlapJoin fired ...`) so
  * an unexpected plan change on a non-genomic join can be traced to
  * this rule and disabled via `spark.graft.overlapJoin.rewrite`.
  */
case class RewriteOverlapJoin(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val BinL = "__graft_bin_l"
  private val BinR = "__graft_bin_r"

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.overlapJoin.rewrite", "true")
      .toBoolean) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.output.exists(_.name == BinL) &&
            !right.output.exists(_.name == BinR) =>
        rewrite(j, left, right, cond).getOrElse(j)
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    // an existing integral equi key means the join is already
    // hash-joinable on a real key (pre-binned or id-equality) — skip
    var hasIntegralEquiKey = false
    // a non-integral equality (the chromosome/partition key) must be
    // present: it anchors the genomic-overlap SHAPE this rule targets.
    // Without it, two opposing integral inequalities are far more
    // likely an unrelated predicate pair (thresholds on different
    // columns, sentinel bounds) whose exploded bin range is unbounded —
    // rewriting those trades a slow-but-correct nested loop for a
    // potentially catastrophic explode.
    var hasPartitionEquiKey = false
    conjuncts.foreach {
      case EqualTo(a, b)
          if (leftOnly(a) && rightOnly(b)) ||
            (rightOnly(a) && leftOnly(b)) =>
        if (integral(a.dataType)) hasIntegralEquiKey = true
        else hasPartitionEquiKey = true
      case _ => ()
    }
    if (hasIntegralEquiKey || !hasPartitionEquiKey) return None

    // lt: (lX, rY) meaning lX < rY; gt: (lZ, rW) meaning lZ > rW
    var lt: Option[(Expression, Expression)] = None
    var gt: Option[(Expression, Expression)] = None
    conjuncts.foreach {
      case LessThan(a, b) if leftOnly(a) && rightOnly(b) =>
        if (lt.isEmpty) lt = Some((a, b))
      case LessThan(a, b) if rightOnly(a) && leftOnly(b) =>
        if (gt.isEmpty) gt = Some((b, a))
      case GreaterThan(a, b) if leftOnly(a) && rightOnly(b) =>
        if (gt.isEmpty) gt = Some((a, b))
      case GreaterThan(a, b) if rightOnly(a) && leftOnly(b) =>
        if (lt.isEmpty) lt = Some((b, a))
      case _ => ()
    }
    (lt, gt) match {
      case (Some((lStart, rEnd)), Some((lEnd, rStart))) =>
        val ops = Seq(lStart, rEnd, lEnd, rStart)
        if (!ops.forall(e => e.deterministic &&
          integral(e.dataType))) return None

        val binSize = conf
          .getConfString("spark.graft.overlapJoin.binSize", "100000").toLong
        val maxBins = conf
          .getConfString("spark.graft.overlapJoin.maxBinsPerRow", "4096")
          .toLong
        val b = Literal(binSize)
        def toLong(e: Expression): Expression =
          if (e.dataType == LongType) e else Cast(e, LongType)
        def sdiv(e: Expression): Expression = IntegralDivide(toLong(e), b)
        def ediv(e: Expression): Expression =
          IntegralDivide(Subtract(toLong(e), Literal(1L)), b)
        // bin count of [s, e) is ediv(e) - sdiv(s) + 1 (degenerate rows
        // collapse to one bin via the greatest() below)
        def isLong(s: Expression, e: Expression): Expression =
          GreaterThanOrEqual(Subtract(ediv(e), sdiv(s)), Literal(maxBins))
        val longL = isLong(lStart, lEnd)
        val longR = isLong(rStart, rEnd)

        // fixed-point guard: the residual branches built below still
        // match the overlap shape, so recognise them by their long-row
        // filter conjuncts and leave them alone (pushdown may merge or
        // relocate the Filter inside the subtree, hence the deep scan)
        if (maxBins > 0) {
          def marked(p: LogicalPlan): Boolean = p.exists {
            case Filter(c, _) => splitConjunctivePredicates(c).exists(x =>
              x.semanticEquals(longL) || x.semanticEquals(Not(longL)) ||
                x.semanticEquals(longR) || x.semanticEquals(Not(longR)))
            case _ => false
          }
          if (marked(left) || marked(right)) return None
        }

        // bins of [s, e): s div B .. (e-1) div B; greatest() keeps the
        // sequence non-empty for degenerate rows instead of erroring
        // Sequence is TimeZoneAwareExpression: it only counts as
        // resolved with a timezone bound, even for pure long bounds
        def bins(s: Expression, e: Expression): Generator =
          Explode(Sequence(sdiv(s),
            Greatest(Seq(sdiv(s), ediv(e))), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)))

        val binL = AttributeReference(BinL, LongType, nullable = false)()
        val binR = AttributeReference(BinR, LongType, nullable = false)()
        // one-bin dedup: keep only the bin holding the overlap's first
        // point, greatest(l_start, r_start) — covered by both sides'
        // exploded ranges whenever the residual predicates hold
        def binnedJoin(l: LogicalPlan, r: LogicalPlan): LogicalPlan = {
          val genLeft = Generate(bins(lStart, lEnd), Nil, outer = false,
            None, Seq(binL), l)
          val genRight = Generate(bins(rStart, rEnd), Nil, outer = false,
            None, Seq(binR), r)
          val dedup = EqualTo(binL, IntegralDivide(
            Greatest(Seq(toLong(lStart), toLong(rStart))), b))
          val newCond = (conjuncts :+ EqualTo(binL, binR) :+ dedup)
            .reduce(And)
          Join(genLeft, genRight, Inner, Some(newCond), j.hint)
        }

        logInfo(s"RewriteOverlapJoin fired (binSize=$binSize, " +
          s"maxBinsPerRow=$maxBins) on join condition: ${cond.sql}")
        if (maxBins <= 0) {
          Some(Project(j.output, binnedJoin(left, right)))
        } else {
          val normalLeft = Filter(Not(longL), left)
          val normalRight = Filter(Not(longR), right)
          val hot = Project(j.output, binnedJoin(normalLeft, normalRight))
          val residualLongLeft = Project(j.output,
            Join(Filter(longL, left), right, Inner, Some(cond), j.hint))
          val residualLongRight = Project(j.output,
            Join(normalLeft, Filter(longR, right), Inner, Some(cond),
              j.hint))
          Some(Union(Seq(hot, residualLongLeft, residualLongRight)))
        }
      case _ => None
    }
  }
}
