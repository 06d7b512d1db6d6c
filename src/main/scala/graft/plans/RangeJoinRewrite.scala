package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite range-shaped theta joins into the
  * binned equi-joins of [[graft.operators.RangeJoin]] — automatically, for
  * plain-SQL users. Two shapes are recognized, tried in order:
  *
  *  1. point-in-interval — `L JOIN R ON p BETWEEN lo AND hi`
  *     (≙ [[graft.operators.RangeJoin.pointInInterval]])
  *  2. interval overlap — `… ON loL <= hiR AND loR <= hiL`
  *     (≙ [[graft.operators.RangeJoin.intervalOverlap]]); each qualifying
  *     pair is attributed to the bin of the overlap region's start
  *     `greatest(loL, loR)`, so exactly-once needs no distinct
  *
  * Spark plans both (with no equi-key) as a broadcast-nested-loop join:
  * O(|L|·|R|) comparisons, the classic scale killer. This rule detects the
  * bound structure — numeric cross-side comparisons forming the shape, and
  * NO usable equi-join predicate — and rewrites the logical plan to
  * (illustrated for shape 1):
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
      // a genuine range JOIN, not a pushable filter: the point must be a
      // column expression and at least one bound must be too (a literal
      // pair `p BETWEEN 5 AND 10` belongs to predicate pushdown, not here)
      if p1.references.nonEmpty && (lo.references.nonEmpty || hi.references.nonEmpty)
      pointLeft <- (if (canEvaluate(p1, l) && canEvaluate(lo, r) &&
          canEvaluate(hi, r)) Some(true)
        else if (canEvaluate(p1, r) && canEvaluate(lo, l) &&
          canEvaluate(hi, l)) Some(false)
        else None)
    } yield (p1, lo, hi, pointLeft)
    candidates.headOption
  }

  /** Explode one side to the bins its `[lo, hi]` covers. `normalize=true`
    * uses `[least(lo,hi), greatest(lo,hi)]` (the overlap pattern cannot
    * prove per-row sanity from its predicates, and an inverted row CAN
    * still satisfy the raw theta condition — so it must be kept, just
    * never allowed to generate a descending sequence); `normalize=false`
    * (point pattern, where `lo ≤ p ≤ hi` proves `lo ≤ hi`) drops inverted
    * rows outright.
    */
  private def explodeBins(side: LogicalPlan, lo: Expression, hi: Expression,
      w: Double, normalize: Boolean): (LogicalPlan, Attribute) = {
    val (seqLo, seqHi) =
      if (normalize) (Least(Seq(lo, hi)), Greatest(Seq(lo, hi)))
      else (lo, hi)
    val sane =
      if (normalize) Filter(And(IsNotNull(lo), IsNotNull(hi)), side)
      else Filter(And(And(IsNotNull(lo), IsNotNull(hi)),
        LessThanOrEqual(lo, hi)), side)
    // Sequence is TimeZoneAwareExpression: resolution REQUIRES a zone id
    // even for a purely numeric sequence
    val seq = Sequence(binOf(seqLo, w), binOf(seqHi, w), None,
      Some(conf.sessionLocalTimeZone))
    val bin = AttributeReference(binName + "_i", LongType, nullable = false)()
    (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bin), child = sane), bin)
  }

  private def rewritePoint(j: Join, conjuncts: Seq[Expression])
      : Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    findPattern(conjuncts, left, right).map { case (p, lo, hi, pointLeft) =>
      val w = binWidth
      val (pointSide, intervalSide) = if (pointLeft) (left, right) else (right, left)
      val pointBin = Alias(binOf(p, w), binName + "_p")()
      val pointPlan = Project(pointSide.output :+ pointBin, pointSide)
      val (intervalPlan, intervalBin) =
        explodeBins(intervalSide, lo, hi, w, normalize = false)
      val newCond = conjuncts.foldLeft[Expression](
        EqualTo(pointBin.toAttribute, intervalBin))(And(_, _))
      val newJoin =
        if (pointLeft) Join(pointPlan, intervalPlan, Inner, Some(newCond), j.hint)
        else Join(intervalPlan, pointPlan, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }

  /** Two-sided interval overlap: `loL ≤ hiR AND loR ≤ hiL` (any mix of
    * strict/non-strict) with each comparison crossing the join — i.e. one
    * `L-expr ≤ R-expr` and one `R-expr ≤ L-expr` conjunct. Both sides
    * explode to their covered bins and each qualifying pair is attributed
    * to ONE canonical bin — that of the overlap region's start
    * `greatest(loL, loR)`, which both explosions necessarily produce
    * (mirrors [[graft.operators.RangeJoin.intervalOverlap]]).
    */
  private def rewriteOverlap(j: Join, conjuncts: Seq[Expression])
      : Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    // normalize every comparison to (small ≤ big); keep cross-side ones
    val leqs = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => Seq((a, b))
      case LessThan(a, b)        => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b)        => Seq((b, a))
      case _ => Nil
    }.filter { case (a, b) =>
      // genuinely cross-side: both ends are column expressions (literals
      // are "evaluable" anywhere and would fake a cross comparison)
      isNumeric(a) && isNumeric(b) &&
        a.references.nonEmpty && b.references.nonEmpty
    }
    val lrOpt = leqs.find { case (a, b) =>
      canEvaluate(a, left) && canEvaluate(b, right) }
    val rlOpt = leqs.find { case (a, b) =>
      canEvaluate(a, right) && canEvaluate(b, left) }
    (lrOpt, rlOpt) match {
      case (Some((loL, hiR)), Some((loR, hiL))) =>
        val w = binWidth
        val (leftPlan, leftBin) =
          explodeBins(left, loL, hiL, w, normalize = true)
        val (rightPlan, rightBin) =
          explodeBins(right, loR, hiR, w, normalize = true)
        val canonical =
          EqualTo(leftBin, binOf(Greatest(Seq(loL, loR)), w))
        val newCond = (conjuncts :+ canonical).foldLeft[Expression](
          EqualTo(leftBin, rightBin))(And(_, _))
        Some(Project(j.output,
          Join(leftPlan, rightPlan, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    if (!(binWidth > 0)) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (conjuncts.exists(isEquiPair(_, left, right))) j
        else rewritePoint(j, conjuncts)
          .orElse(rewriteOverlap(j, conjuncts))
          .getOrElse(j)
    }
  }
}
