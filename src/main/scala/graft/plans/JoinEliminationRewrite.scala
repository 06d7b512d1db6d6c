package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Catalyst optimizer rule: LEFT-JOIN ELIMINATION under declared unique
  * keys — drop a left outer join whose right side contributes nothing.
  * The classic warehouse move (Oracle/DB2 do it from PK metadata; Spark
  * can't, having no constraints): generated BI SQL habitually left-joins
  * every dimension "just in case", and at 100 TB each unused dimension
  * join is a full shuffle + build of a table nobody reads.
  *
  * Soundness, precisely: for `l LEFT OUTER JOIN r ON cond`, if no column
  * of `r` is referenced above the join, the join can only change the
  * result by DUPLICATING left rows (a left row matching m > 1 right rows
  * appears m times; 0 matches still appears once, null-extended). If some
  * equality conjunct pins a right-side column that is UNIQUE in `r` to a
  * left-side expression, m ≤ 1 always — the join is a row-preserving
  * no-op and is removed. Inner joins are NOT touched (they also filter
  * unmatched left rows, which needs referential integrity, not just
  * uniqueness); non-equi or non-unique conditions are not touched.
  *
  * Spark has no PK catalog, so uniqueness is DECLARED, per session, as
  * attribute names — the user's assertion, like every uniqueness hint in
  * every engine that ships this rewrite:
  *
  *   spark.graft.joinElim.enabled    = true
  *   spark.graft.joinElim.uniqueKeys = c_custkey,s_suppkey
  *
  * Scope guards: only a `Project` or `Aggregate` sitting DIRECTLY on a
  * `Join(LeftOuter)` and reading strictly from the left side (the two
  * shapes column pruning leaves behind for an unused dimension); the
  * unique attribute must be on the RIGHT output and compared to a
  * left-rooted expression; the right subtree is discarded whole (never
  * executed), which is exactly the point.
  */
object JoinEliminationRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.joinElim.enabled", "false").toBoolean

  private def uniqueKeys: Set[String] = SQLConf.get
    .getConfString("spark.graft.joinElim.uniqueKeys", "")
    .split(",").map(_.trim).filter(_.nonEmpty).toSet

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Some equality conjunct pins a declared-unique right attribute to an
    * expression rooted entirely in the left side.
    */
  private def pinsUniqueRightKey(cond: Expression, join: Join,
      unique: Set[String]): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a: Attribute, b)
          if join.right.outputSet.contains(a) && unique.contains(a.name) &&
            b.references.subsetOf(join.left.outputSet) => true
      case EqualTo(b, a: Attribute)
          if join.right.outputSet.contains(a) && unique.contains(a.name) &&
            b.references.subsetOf(join.left.outputSet) => true
      case _ => false
    }

  /** The join is droppable beneath a parent whose expressions are `exprs`. */
  private def droppable(exprs: Seq[Expression], j: Join,
      unique: Set[String]): Boolean = j match {
    case Join(left, _, LeftOuter, Some(cond), _) =>
      exprs.forall(_.references.subsetOf(left.outputSet)) &&
        pinsUniqueRightKey(cond, j, unique)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || uniqueKeys.isEmpty) plan
    else {
      val unique = uniqueKeys
      plan.transform {
        case p @ Project(projList, j: Join)
            if droppable(projList, j, unique) =>
          p.withNewChildren(Seq(j.left))
        case a: Aggregate
            if a.child.isInstanceOf[Join] &&
              droppable(a.groupingExpressions ++ a.aggregateExpressions,
                a.child.asInstanceOf[Join], unique) =>
          a.withNewChildren(Seq(a.child.asInstanceOf[Join].left))
      }
    }
}
