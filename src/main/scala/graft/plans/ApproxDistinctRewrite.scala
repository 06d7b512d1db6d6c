package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Catalyst optimizer rule: OPT-IN sketch substitution — rewrite exact
  * `COUNT(DISTINCT x)` into `approx_count_distinct(x)` (HyperLogLog++)
  * when the session asks for it. The query-acceleration move every
  * warehouse exposes as a knob: an exact distinct count shuffles every
  * distinct value (and multi-distinct plans Expand the input N ways),
  * while the HLL++ sketch is a fixed few-KiB buffer per group that
  * partial-aggregates map-side — at 100 TB the difference between
  * shuffling the column and shuffling nothing.
  *
  * Strictly conf-gated and OFF by default: results CHANGE (bounded by the
  * sketch's relative standard deviation), so the user must opt in, per
  * session —
  *
  *   spark.graft.approxDistinct.enabled = true
  *   spark.graft.approxDistinct.rsd     = 0.05   // optional
  *
  * Scope guards: only `Count` with ONE deterministic child is rewritten.
  * Multi-column `COUNT(DISTINCT a, b)` keeps exact semantics (HLL++ takes
  * one child; stacking a struct would change null semantics), as do
  * `SUM(DISTINCT)`/`AVG(DISTINCT)` (their distinctness changes the VALUE,
  * not just the cost). FILTER clauses are preserved. The rewrite keeps the
  * surrounding alias (and thus every downstream reference) intact by
  * swapping only the aggregate function inside the AggregateExpression —
  * both functions return LongType.
  *
  * Reference analog: the reference's consumers do exactly this downgrade
  * by hand when dashboarding cardinalities; q27 gates the function, this
  * rule gates the PLAN-level substitution.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.approxDistinct.enabled", "false").toBoolean

  private def rsd: Double = SQLConf.get
    .getConfString("spark.graft.approxDistinct.rsd", "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case a: Aggregate =>
        val r = rsd
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _)
              if child.deterministic =>
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(child, r),
              isDistinct = false)
        }
    }
}
