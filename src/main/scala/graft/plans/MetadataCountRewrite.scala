package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf

/** Catalyst optimizer rule (the repo's FOURTH): METADATA-ONLY COUNT(*) —
  * an unfiltered `SELECT COUNT(*) FROM parquet_table` never needs to scan
  * a single data page: every parquet footer already records its exact row
  * count. The rule replaces the whole Aggregate-over-scan with a
  * `LocalRelation` holding the summed footer counts — the optimization
  * every warehouse ships (Snowflake/BigQuery answer it from table
  * metadata) and the single most common query against a fresh table.
  * At 100 TB this is the difference between reading footers (KBs per
  * file, driver- or job-side) and scanning the table.
  *
  * Conf-gated ON opt-in (`spark.graft.metaCount.enabled`) because it
  * front-loads footer IO into planning time — the right trade for
  * interactive sessions, surprising for `EXPLAIN`-only workflows.
  *
  * Scope guards (all must hold, else stand down):
  *   - a global Aggregate (no grouping) whose every output is an alias of
  *     plain `COUNT(1)`/`COUNT(*)` — no DISTINCT, no FILTER clause;
  *   - directly over a parquet `HadoopFsRelation` scan (optionally through
  *     a pure attribute/empty Project) — any Filter in between disables
  *     the rewrite (a predicate means footer counts are wrong);
  *   - parquet only: its footer row counts are exact by format contract.
  *
  * Footer reads here loop on the driver — bounded by file count, exactly
  * the metadata a `describe` touches. A deployment with 10⁶ files runs the
  * same sum as a tiny Spark job over the file list instead.
  */
object MetadataCountRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.metaCount.enabled", "false").toBoolean

  private def isPlainCountStar(e: AggregateExpression): Boolean = e match {
    // v != null: COUNT(NULL) counts non-null values (always 0) — it must
    // NOT rewrite to the footer total. Only COUNT(*)/COUNT(1)-shaped
    // non-null literals qualify.
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _) if v != null => true
    case _ => false
  }

  /** The bare-parquet-scan check: LogicalRelation(parquet), possibly under
    * a Project that reads only attributes (column pruning's leftovers).
    * Shared with [[MetadataMinMaxRewrite]].
    */
  private[plans] def bareParquetScan(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, false, _)
          if fs.fileFormat.isInstanceOf[ParquetFileFormat] => Some(fs)
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareParquetScan(child)
      case _ => None
    }

  private def footerCount(fs: HadoopFsRelation): Long = {
    val conf = fs.sparkSession.sessionState.newHadoopConf()
    fs.location.inputFiles.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate
          if agg.groupingExpressions.isEmpty &&
            agg.aggregateExpressions.nonEmpty &&
            agg.aggregateExpressions.forall {
              case Alias(ae: AggregateExpression, _) => isPlainCountStar(ae)
              case _ => false
            } =>
        bareParquetScan(agg.child) match {
          case Some(fs) =>
            val n = footerCount(fs)
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
          case None => agg
        }
    }
}
