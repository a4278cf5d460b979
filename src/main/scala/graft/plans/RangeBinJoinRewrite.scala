package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: re-plan a pure interval join into a binned equi-join.
  *
  * {{{ points JOIN intervals ON p.x >= i.lo AND p.x <= i.hi }}}
  * has no equi-key, so Spark plans a nested-loop product — O(|p|·|i|).
  * With a bin width w, every interval [lo, hi] overlaps bins
  * floor(lo/w)..floor(hi/w) and a point belongs to exactly ONE bin, so the
  * same join is: explode the interval side over its overlapped bins,
  * equi-join on the point's bin, and keep the original condition as the
  * exact verification. Each qualifying pair matches in precisely one bin
  * (the point's), so multiplicity is preserved with no dedup.
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` (positive long, same unit
  * as the join columns) per query — bin width is a data-dependent choice
  * (≈ a typical interval length: too small explodes the interval side,
  * too large degrades to few giant buckets). Applies to LongType bounds;
  * cast timestamps to epoch seconds. Fires only on inner joins with no
  * equi-conjunct; the rewritten join's bin-equality conjunct makes the
  * rule idempotent. Deployed with [[HammingJoinRewrite]] via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
case class RangeBinJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toLong
    if (width <= 0) plan else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(l, r) => straddles(l, r, j)
          case EqualNullSafe(l, r) => straddles(l, r, j)
          case _ => false
        }
        if (hasEqui) j else findBand(conjuncts, j) match {
          case Some((x, lo, hi)) => rewrite(j, x, lo, hi, width)
          case None => j
        }
    }
  }

  private def straddles(l: Expression, r: Expression, j: Join): Boolean =
    (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
    (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))

  /** Find `x >= lo` and `x <= hi` conjuncts (strict variants included —
    * the original condition stays as the verify) where x is a LongType
    * expression over one join side and lo/hi both over the other.
    * Literal-only bounds don't qualify (they'd have been pushed down as
    * plain filters anyway, and give no side to explode). */
  private def findBand(conjuncts: Seq[Expression], j: Join): Option[(Expression, Expression, Expression)] = {
    // Some(true) = expression reads only the left side
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    // (x, bound, boundIsLower) — both orientations of each comparison
    val bounds = conjuncts.collect {
      case GreaterThanOrEqual(x, lo) => (x, lo, true)
      case GreaterThan(x, lo) => (x, lo, true)
      case LessThan(lo, x) => (x, lo, true)
      case LessThanOrEqual(lo, x) => (x, lo, true)
    } ++ conjuncts.collect {
      case LessThanOrEqual(x, hi) => (x, hi, false)
      case LessThan(x, hi) => (x, hi, false)
      case GreaterThan(hi, x) => (x, hi, false)
      case GreaterThanOrEqual(hi, x) => (x, hi, false)
    }
    val candidates = for {
      (x1, lo, isLo) <- bounds if isLo
      (x2, hi, isHi) <- bounds if !isHi
      if x1.semanticEquals(x2)
      if x1.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
      if x1.deterministic && lo.deterministic && hi.deterministic
      xSide <- sideOf(x1).toSeq
      loSide <- sideOf(lo).toSeq
      hiSide <- sideOf(hi).toSeq
      if loSide == hiSide && loSide != xSide
    } yield (x1, lo, hi)
    candidates.headOption
  }

  /** floorDiv for longs (IntegralDivide truncates toward zero; subtracting
    * the positive mod first makes it exact floor for negatives too).
    * Domain note: values within `w` of Long.MinValue would overflow the
    * subtraction — epoch/key domains are nowhere near it. */
  private def bin(e: Expression, w: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))

  private def rewrite(j: Join, x: Expression, lo: Expression, hi: Expression,
                      w: Long): LogicalPlan = {
    val intervalOnLeft = lo.references.subsetOf(j.left.outputSet)
    val intervalSide = if (intervalOnLeft) j.left else j.right
    val binAttr = AttributeReference("graft_range_bin", LongType, nullable = true)()
    // A single outlier interval (or a unit mismatch with binWidth) could
    // explode into an astronomical bin array; fail with an actionable
    // message instead of an opaque Sequence error deep in a task.
    val maxBins = conf.getConfString("spark.graft.rangeJoin.maxBins", "10000").toLong
    val guard = If(
      LessThanOrEqual(Subtract(bin(hi, w), bin(lo, w)), Literal(maxBins)),
      Literal(0L),
      Cast(RaiseError(Literal(
        s"graft range-bin join: an interval spans more than $maxBins bins at " +
          s"binWidth=$w; raise spark.graft.rangeJoin.binWidth or " +
          "spark.graft.rangeJoin.maxBins")), LongType))
    // empty or null interval (lo > hi, null bound) must yield no bins, not
    // a Sequence error — the naive join just emits nothing for such rows
    val bins = If(
      And(And(IsNotNull(lo), IsNotNull(hi)), LessThanOrEqual(lo, hi)),
      // Sequence is TimeZoneAwareExpression: resolved only with a tz set,
      // even for integral sequences
      Sequence(Add(bin(lo, w), guard), bin(hi, w), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val exploded = Generate(Explode(bins), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binAttr), child = intervalSide)
    val newCond = And(EqualTo(bin(x, w), binAttr), j.condition.get)
    val rejoined =
      if (intervalOnLeft) Join(exploded, j.right, Inner, Some(newCond), j.hint)
      else Join(j.left, exploded, Inner, Some(newCond), j.hint)
    // strip the bin column: restore the original join's output
    Project(j.output, rejoined)
  }
}
