package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: re-plan a naive Hamming-distance join into the
  * pigeonhole chunked equi-join.
  *
  * A user writing
  * {{{ a JOIN b ON bit_count(a.sig ^ b.sig) <= 3 }}}
  * gets a nested-loop cross product from the built-in planner — O(|a|·|b|)
  * comparisons, a non-starter at cluster scale. But Hamming distance ≤ k on
  * a 64-bit sketch implies at least one of k+1 disjoint bit-chunks is
  * IDENTICAL (pigeonhole), so the same join is answerable as k+1 shuffled
  * equi-joins on chunk values plus an exact re-check — the plan
  * [[graft.dedup.Dedup.simHashNearDup]] builds by hand. This rule performs
  * that rewrite inside Catalyst, so plain SQL scales without the user
  * knowing the trick.
  *
  * Branch i joins on `chunk_i(a) = chunk_i(b)` AND `chunk_j(a) != chunk_j(b)`
  * for all j < i ("first equal chunk"), so every qualifying pair surfaces in
  * EXACTLY one branch — join multiplicity is preserved without a distinct.
  * The original condition (including the bit_count bound) is kept in every
  * branch as the exact verification.
  *
  * The rule fires only when the join has NO equi-conjunct: with an equi key
  * Spark already picks a hash join (the filter is cheap post-work), and the
  * rewritten branches themselves carry chunk-equality conjuncts, which makes
  * the rule idempotent under the optimizer's fixed-point batch.
  *
  * SELF-SELECTING (r14, VERDICT r13 #6): the rewrite's win is asymptotic —
  * below a small-corpus crossover (~5k sketches a side at sf0.1) the
  * (k+1)-branch shuffle overhead exceeds the naive broadcast
  * nested-loop, so the rule now gates itself on the logical plan's OWN
  * size estimates: it fires only when `left.sizeInBytes ×
  * right.sizeInBytes` ≥ [[HammingJoinRewrite.MinBytesProductKey]]
  * (default ≈ the measured crossover; `0` forces the rewrite
  * everywhere, for plan specs and demos). Unknown stats default to
  * `Long.MaxValue` sizes and therefore rewrite — the safe direction:
  * the failure mode of a wrong "big" guess is a few extra shuffles, of
  * a wrong "small" guess an O(|a|·|b|) nested loop.
  *
  * Deployed via `spark.sql.extensions=graft.GraftExtensions`
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  */
case class HammingJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import HammingJoinRewrite.{DefaultMinBytesProduct, MinBytesProductKey}

  /** Chunks narrower than 8 bits bucket too coarsely to help. */
  private val MaxDistance = 7

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) => straddles(l, r, j)
        case EqualNullSafe(l, r) => straddles(l, r, j)
        case _ => false
      }
      val hamming = if (hasEqui) None else conjuncts.collectFirst {
        case HammingBound(a, b, k) if k >= 0 && k <= MaxDistance &&
          a.deterministic && b.deterministic &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
           (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))) =>
          (a, b, k)
      }
      hamming match {
        case Some((a, b, k)) if aboveCrossover(j) => rewrite(j, a, b, k)
        case _ => j
      }
  }

  /** Estimated-size self-selection: BNL below the crossover, chunked
    * equi-join at and above it. */
  private def aboveCrossover(j: Join): Boolean = {
    val threshold = BigInt(conf.getConfString(
      MinBytesProductKey, DefaultMinBytesProduct.toString))
    threshold <= 0 ||
      j.left.stats.sizeInBytes * j.right.stats.sizeInBytes >= threshold
  }

  private def straddles(l: Expression, r: Expression, j: Join): Boolean =
    (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
    (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))

  /** `bit_count(a ^ b) <= k` in either literal order, with or without an
    * integral cast around the count. */
  private object HammingBound {
    private def intOf(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
    private def count(e: Expression): Option[(Expression, Expression)] = e match {
      case Cast(c, _, _, _) => count(c)
      case BitwiseCount(BitwiseXor(a, b)) if a.dataType == LongType && b.dataType == LongType =>
        Some((a, b))
      case _ => None
    }
    def unapply(e: Expression): Option[(Expression, Expression, Int)] = e match {
      case LessThanOrEqual(c, lit) =>
        for (k <- intOf(lit); (a, b) <- count(c)) yield (a, b, k)
      case GreaterThanOrEqual(lit, c) =>
        for (k <- intOf(lit); (a, b) <- count(c)) yield (a, b, k)
      case LessThan(c, lit) =>
        for (k <- intOf(lit); (a, b) <- count(c)) yield (a, b, k - 1)
      case GreaterThan(lit, c) =>
        for (k <- intOf(lit); (a, b) <- count(c)) yield (a, b, k - 1)
      case _ => None
    }
  }

  private def rewrite(j: Join, a: Expression, b: Expression, k: Int): LogicalPlan = {
    val n = k + 1
    // n chunks over 64 bits; the first (64 % n) chunks get the extra bit
    val widths = Array.tabulate(n)(i => 64 / n + (if (i < 64 % n) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def chunk(e: Expression, i: Int): Expression = {
      val shifted = if (offsets(i) == 0) e
        else ShiftRightUnsigned(e, Literal(offsets(i)))
      if (widths(i) == 64) shifted
      else BitwiseAnd(shifted, Literal((1L << widths(i)) - 1))
    }
    val eq = Array.tabulate(n)(i => EqualTo(chunk(a, i), chunk(b, i)))
    val branches: Seq[LogicalPlan] = (0 until n).map { i =>
      val firstEqual = (0 until i).map(jj => Not(eq(jj)): Expression) :+ (eq(i): Expression)
      // keep the ORIGINAL condition intact as exact verification
      val branchCond = (firstEqual :+ j.condition.get).reduce(And)
      Join(j.left, j.right, Inner, Some(branchCond), j.hint)
    }
    if (n == 1) branches.head else Union(branches, byName = false, allowMissingCol = false)
  }
}

object HammingJoinRewrite {
  /** Minimum `left.sizeInBytes × right.sizeInBytes` estimate for the
    * rewrite to fire; `0` forces it regardless of stats. */
  val MinBytesProductKey = "spark.graft.hammingRewrite.minBytesProduct"
  /** ≈ (5k sketches × ~30 B/row)² — the measured small-corpus crossover
    * where the chunked equi-join starts beating the nested loop. */
  val DefaultMinBytesProduct: BigInt = BigInt("20000000000")
}
