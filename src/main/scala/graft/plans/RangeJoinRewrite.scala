package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite a point-in-interval theta join into the
  * binned equi-join of [[graft.operators.RangeJoin.pointInInterval]] —
  * automatically, for plain-SQL users.
  *
  * Spark plans `L JOIN R ON p BETWEEN lo AND hi` (no equi-key) as a
  * broadcast-nested-loop join: O(|L|·|R|) comparisons, the classic scale
  * killer. This rule detects the shape — a lower and an upper bound on the
  * same numeric expression, point on one side, bounds on the other, and NO
  * usable equi-join predicate — and rewrites the logical plan to:
  *
  * {{{
  *   point side:    + _graft_bin  = floor(p / w)
  *   interval side: + _graft_bin  = explode(sequence(floor(lo/w), floor(hi/w)))
  *                    (pre-filtered to lo IS NOT NULL AND hi IS NOT NULL
  *                     AND lo <= hi — rows that can never match, dropped
  *                     before they could explode a pathological bin range)
  *   join:          ON binL = binR AND <original condition, verbatim>
  *   project:       back to the original join output
  * }}}
  *
  * One hash shuffle on the bin id instead of a nested loop; the original
  * predicates run unchanged inside the bin, so results are identical (each
  * qualifying pair meets exactly once — in the point's single bin, which the
  * interval's explosion necessarily covers: double division by a positive
  * width and floor are monotone, so lo ≤ p ≤ hi ⇒ bin(lo) ≤ bin(p) ≤
  * bin(hi); strict bounds are a subset). Fires only when no equi-join
  * predicate exists — with an equi key Spark already hash-joins and
  * evaluates BETWEEN as a post-filter, and the bin equality the rewrite
  * introduces makes the rule self-terminating under fixed-point batches.
  *
  * Configuration (runtime conf, read at optimization time):
  *  - `spark.graft.rangeJoin.enabled`  (default true)
  *  - `spark.graft.rangeJoin.binWidth` (default 1024.0) — choose near the
  *    typical interval length: smaller multiplies interval duplication,
  *    larger multiplies within-bin comparisons.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * extension-built sessions, or appended to
  * `spark.experimental.extraOptimizations` on any live session.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val binName = "_graft_bin"

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def binWidth: Double =
    conf.getConfString("spark.graft.rangeJoin.binWidth", "1024.0").toDouble

  /** floor(x / w) as a LONG — identical arithmetic on both sides, so equal
    * inputs always land in equal bins.
    */
  private def binOf(x: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w))), LongType)

  private def isNumeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  /** A conjunct that already equi-joins the two sides (hash-joinable as-is;
    * also true of this rule's own output, which terminates the fixed point).
    */
  private def isEquiPair(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (canEvaluate(a, l) && canEvaluate(b, r)) ||
          (canEvaluate(a, r) && canEvaluate(b, l))
      case EqualNullSafe(a, b) =>
        (canEvaluate(a, l) && canEvaluate(b, r)) ||
          (canEvaluate(a, r) && canEvaluate(b, l))
      case _ => false
    }

  /** Normalize a comparison into bound views: (bounded expr, bound,
    * isLower). `a >= b` bounds a below AND bounds b above; strictness is
    * irrelevant here because the original predicate is re-applied verbatim
    * in-bin (bins only need to be a superset).
    */
  private def boundViews(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Nil
    }

  /** Find (point, lo, hi, pointSideIsLeft): a lower and an upper bound on
    * the same expression, point evaluable on one side, both bounds on the
    * other, all numeric.
    */
  private def findPattern(conjuncts: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val views = conjuncts.flatMap(boundViews)
    val lowers = views.filter(_._3)
    val uppers = views.filterNot(_._3)
    val candidates = for {
      (p1, lo, _) <- lowers
      (p2, hi, _) <- uppers
      if p1.semanticEquals(p2) && isNumeric(p1) && isNumeric(lo) && isNumeric(hi)
      pointLeft <- (if (canEvaluate(p1, l) && canEvaluate(lo, r) &&
          canEvaluate(hi, r)) Some(true)
        else if (canEvaluate(p1, r) && canEvaluate(lo, l) &&
          canEvaluate(hi, l)) Some(false)
        else None)
    } yield (p1, lo, hi, pointLeft)
    candidates.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val w = binWidth
    if (!(w > 0)) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && {
            val cs = splitConjunctivePredicates(cond)
            !cs.exists(isEquiPair(_, left, right)) &&
              findPattern(cs, left, right).isDefined
          } =>
        val conjuncts = splitConjunctivePredicates(cond)
        val (p, lo, hi, pointLeft) = findPattern(conjuncts, left, right).get
        val (pointSide, intervalSide) = if (pointLeft) (left, right) else (right, left)

        val pointBin = Alias(binOf(p, w), binName + "_p")()
        val pointPlan = Project(pointSide.output :+ pointBin, pointSide)

        // rows whose interval can never match are dropped BEFORE the
        // explosion — an inverted (lo > hi) or null-bounded row would
        // otherwise generate a pathological (even descending) bin sequence
        val sane = Filter(And(And(IsNotNull(lo), IsNotNull(hi)),
          LessThanOrEqual(lo, hi)), intervalSide)
        // Sequence is TimeZoneAwareExpression: resolution REQUIRES a zone id
        // even for a purely numeric sequence
        val seq = Sequence(binOf(lo, w), binOf(hi, w), None,
          Some(conf.sessionLocalTimeZone))
        val intervalBin =
          AttributeReference(binName + "_i", LongType, nullable = false)()
        val intervalPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(intervalBin), child = sane)

        val newCond = conjuncts.foldLeft[Expression](
          EqualTo(pointBin.toAttribute, intervalBin))(And(_, _))
        val newJoin =
          if (pointLeft) Join(pointPlan, intervalPlan, Inner, Some(newCond), hint)
          else Join(intervalPlan, pointPlan, Inner, Some(newCond), hint)
        Project(j.output, newJoin)
    }
  }
}
