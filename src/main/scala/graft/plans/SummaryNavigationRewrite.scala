package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DataType

/** One registered summary (materialized aggregate) over one fact table.
  *
  * `measures` name the summary's pre-aggregated columns and state exactly
  * which fact-side aggregate each one answers:
  *   - `sum` over `srcCol`, optionally through an explicit cast — the
  *     summary column holds `SUM(cast(srcCol AS castTo))` per group;
  *   - `count` — the summary column holds `COUNT(*)` per group.
  * Only these two families are ADDITIVE in the exact sense the rewrite
  * requires: regrouping partial sums/counts reproduces the global result
  * value-for-value (decimal/integral arithmetic — doubles are refused at
  * registration because a double sum is order-dependent, so "rewritten ≡
  * not rewritten" could not be bit-exact). Non-additive aggregates (AVG,
  * COUNT DISTINCT, percentiles) are exactly what the rule must refuse —
  * those are the q55/q71 sketch territory.
  */
final case class SummaryMeasure(name: String, fn: String, srcCol: String,
    castTo: Option[DataType] = None)

final case class SummaryDef(factPath: String, summaryPath: String,
    groupCols: Seq[String], measures: Seq[SummaryMeasure])

/** Session-wide registry of summary tables keyed by fact-table path —
  * the tiny catalog every warehouse keeps next to its cube layer. Entries
  * are only consulted when `spark.graft.summaryNav.enabled` is set on the
  * consulting session, so registration alone never changes a plan.
  *
  * == Refresh discipline ==
  * `register` is an atomic repoint (ConcurrentHashMap.put), so the
  * freshness loop needs no further machinery: write the NEW summary
  * snapshot to a fresh directory, then `register(d.copy(summaryPath =
  * newDir))` — queries planned before the repoint keep reading the old
  * files (leave them until in-flight readers drain, then delete), queries
  * planned after read the new ones, and no reader ever sees a
  * half-written snapshot. The cdc44 gate closes the producing half of the
  * loop: an IVM standing aggregate ([[graft.cdc.IncrementalAgg]])
  * publishes the snapshot the registry points at.
  */
object SummaryRegistry {
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, SummaryDef]()

  /** Scheme-insensitive path identity: a scan's rootPaths come back
    * filesystem-qualified (`file:/x`, `hdfs://nn/x`) while registration
    * usually passes the bare path — compare on the path component.
    */
  private def normalize(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri.normalize()
    Option(uri.getPath).filter(_.nonEmpty).getOrElse(uri.toString)
      .stripSuffix("/")
  }

  def register(d: SummaryDef): Unit = {
    require(d.measures.forall(m => m.fn == "sum" || m.fn == "count"),
      "only additive measures (sum/count) are registrable")
    require(!d.measures.exists(_.castTo.exists(
        _ == org.apache.spark.sql.types.DoubleType)),
      "double sums are order-dependent — register a decimal cast instead")
    defs.put(normalize(d.factPath), d)
  }

  def unregister(factPath: String): Unit = defs.remove(normalize(factPath))

  def lookup(paths: Seq[String]): Option[SummaryDef] = {
    val n = paths.map(normalize)
    // single-root scans only: a multi-path scan is not "the fact table"
    if (n.distinct.size == 1) Option(defs.get(n.head)) else None
  }

  /** Build and persist the summary EXACTLY as the rewrite assumes it was
    * built — group by `groupCols`, one column per measure. Registering a
    * summary produced any other way is the caller's correctness bug; this
    * helper makes the contract constructive.
    */
  def build(spark: SparkSession, d: SummaryDef): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val aggs = d.measures.map { m =>
      m.fn match {
        case "count" => count(lit(1)).as(m.name)
        case "sum" =>
          val src = m.castTo.fold(col(m.srcCol))(t => col(m.srcCol).cast(t))
          sum(src).as(m.name)
      }
    }
    spark.read.parquet(d.factPath)
      .groupBy(d.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(d.summaryPath)
    register(d)
  }
}

/** Catalyst optimizer rule (the repo's FIFTH): MATERIALIZED-VIEW MATCHING
  * for additive aggregates — `SELECT k, SUM(x), COUNT(*) FROM fact GROUP
  * BY k` answered from a registered summary table grouped by a SUPERSET
  * of `k`, scanning O(groups) summary rows instead of the 100 TB fact.
  * The by-hand version is q77 (the user navigates to the summary
  * themselves); this rule is the optimizer making that move for plain
  * DataFrame/SQL code, the way warehouse cube layers do.
  *
  * Conf-gated ON opt-in (`spark.graft.summaryNav.enabled`), like every
  * rule this library injects, because it changes which TABLE a query
  * reads — the user opts into trusting the registry's freshness contract
  * (a stale summary answers stale values; IVM, cdc14's IncrementalAgg,
  * is how this library keeps one current).
  *
  * Match requirements (ALL must hold, else stand down — the refusal set
  * is the point, mis-matching silently would be a wrong-results bug):
  *   - an Aggregate directly over a bare parquet scan of the registered
  *     fact path (pure-attribute Project tolerated; any Filter disables —
  *     partial sums cannot answer a filtered query);
  *   - every grouping expression is a plain column ⊆ the summary's
  *     grouping columns (subset: regrouping partials is the whole trick);
  *   - every aggregate output is a grouping column or an alias of plain
  *     `SUM(col)` / `SUM(CAST(col AS t))` / `COUNT(*)` matching a
  *     registered measure — no DISTINCT, no FILTER clause, nothing
  *     non-additive.
  *
  * The rewritten aggregate re-sums the summary's partial columns and
  * casts back to each original result type (decimal sums widen per sum
  * level — `SUM(dec(18,2))` is dec(28,2), re-summing gives dec(38,2);
  * the down-cast is exact whenever the original query itself would not
  * have overflowed, which is the only regime in which the original was
  * well-defined). Output attribute ids are preserved so parent operators
  * resolve unchanged; results are bit-identical to the rule-off plan
  * (integral/decimal arithmetic only — doubles refused at registration).
  */
object SummaryNavigationRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.summaryNav.enabled", "false").toBoolean

  /** LogicalRelation(parquet) under pure-attribute Projects only. */
  private def bareParquetScan(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, false, _)
          if fs.fileFormat.isInstanceOf[ParquetFileFormat] => Some(fs)
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareParquetScan(child)
      case _ => None
    }

  /** Which registered measure answers this aggregate call, if any. */
  private def matchMeasure(ae: AggregateExpression,
      d: SummaryDef): Option[SummaryMeasure] = ae match {
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
        if v != null =>
      d.measures.find(_.fn == "count")
    case AggregateExpression(s: Sum, _, false, None, _) =>
      s.child match {
        case a: AttributeReference =>
          d.measures.find(m => m.fn == "sum" && m.srcCol == a.name &&
            m.castTo.isEmpty)
        case Cast(a: AttributeReference, dt, _, _) =>
          d.measures.find(m => m.fn == "sum" && m.srcCol == a.name &&
            m.castTo.contains(dt))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val fs = bareParquetScan(agg.child).getOrElse(return None)
    val d = SummaryRegistry.lookup(
      fs.location.rootPaths.map(_.toString)).getOrElse(return None)
    // grouping: plain columns, subset of the summary's grouping set
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => Some(a)
      case _ => None
    }
    if (groupAttrs.exists(_.isEmpty)) return None
    // the summary relation — fresh exprIds per rewrite (MultiInstance)
    val spark = fs.sparkSession
    val summaryRel = spark.read.parquet(d.summaryPath)
      .queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation => lr.newInstance()
      }.getOrElse(return None)
    val sAttr: Map[String, AttributeReference] =
      summaryRel.output.collect { case a: AttributeReference => a.name -> a }
        .toMap

    val outputs = agg.aggregateExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) =>
        sAttr.get(a.name).map(sa => Alias(sa, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        for { m <- matchMeasure(ae, d); sa <- sAttr.get(m.name) } yield {
          val reSum: Expression = AggregateExpression(
            Sum(sa), Complete, isDistinct = false)
          val typed =
            if (reSum.dataType == ae.dataType) reSum
            else Cast(reSum, ae.dataType)
          Alias(typed, name)(exprId = al.exprId)
        }
      case _ => None
    }
    if (outputs.exists(_.isEmpty)) return None
    val groupOut = groupAttrs.flatten.map(a => sAttr.get(a.name) match {
      case Some(sa) => sa
      case None => return None
    })
    Some(Aggregate(groupOut, outputs.flatten, summaryRel))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }
}
