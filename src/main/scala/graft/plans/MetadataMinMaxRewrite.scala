package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType}

/** Catalyst optimizer rule (the repo's SIXTH): METADATA-ONLY MIN/MAX —
  * the companion to [[MetadataCountRewrite]]. An unfiltered
  * `SELECT MIN(c), MAX(c), COUNT(*) FROM parquet_table` never needs data
  * pages either: every parquet column chunk's footer records min/max and
  * null counts. The rule folds them across files on the driver and
  * replaces the Aggregate-over-scan with a `LocalRelation` — O(files)
  * footer KBs instead of a 100 TB scan (the `describe table` fast path
  * every warehouse ships).
  *
  * Conf-gated ON opt-in (`spark.graft.metaMinMax.enabled`), same
  * planning-time-IO trade as the count rule.
  *
  * Scope guards (all must hold, else stand down — results must be
  * BIT-IDENTICAL to rule-off on every input):
  *   - a global Aggregate whose every output is plain `COUNT(*)` /
  *     `MIN(col)` / `MAX(col)` (no DISTINCT/FILTER), with at least one
  *     MIN/MAX (pure counts belong to [[MetadataCountRewrite]]);
  *   - directly over a bare parquet scan (any Filter disables it);
  *   - column types where parquet footer values are provably EXACT, not
  *     just ordering-valid: INT32/INT64 (signed, = Int/Long/Date).
  *     BINARY-UTF8 stands down — writers may TRUNCATE binary min/max
  *     (parquet-mr's parquet.statistics.truncate.length, Arrow) and the
  *     Statistics struct carries no exactness flag, so a footer string can
  *     be a bound that never occurs in the data (fine for pruning, wrong
  *     for answering MIN/MAX verbatim). Float/double stand down —
  *     NaN-polluted legacy stats are undetectable; decimals, timestamps,
  *     and nested paths stand down; PARTITION columns stand down (they
  *     are not in footers);
  *   - every row group must carry usable statistics: min/max present, or
  *     a null count proving the chunk is entirely null. Any chunk with
  *     absent/invalid stats disables the rewrite (never guess).
  *
  * Null semantics preserved exactly: MIN/MAX ignore nulls; a table whose
  * column is entirely null (or an empty table) answers NULL, and the
  * empty table's COUNT answers 0 — the same one-row result Spark's global
  * aggregate produces.
  */
object MetadataMinMaxRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.metaMinMax.enabled", "false").toBoolean

  private sealed trait Spec
  private case object CountStar extends Spec
  private final case class Extreme(name: String, dt: DataType, isMin: Boolean)
      extends Spec

  private def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType => true
    case _ => false
  }

  private def specOf(e: AggregateExpression): Option[Spec] = e match {
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
        if v != null => Some(CountStar)
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if supported(a.dataType) => Some(Extreme(a.name, a.dataType, isMin = true))
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if supported(a.dataType) => Some(Extreme(a.name, a.dataType, isMin = false))
    case _ => None
  }

  /** Footer fold: Some(rowCount, perColumn min/max internal values) or
    * None when any chunk's statistics are unusable.
    */
  private def footerFold(fs: HadoopFsRelation, cols: Seq[(String, DataType)])
      : Option[(Long, Map[(String, Boolean), Any])] = {
    val conf = fs.sparkSession.sessionState.newHadoopConf()
    var rows = 0L
    // (name, isMin) -> running extreme (null = no non-null value seen yet)
    val acc = scala.collection.mutable.Map.empty[(String, Boolean), Any]
    for (f <- fs.location.inputFiles) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks
        val it = blocks.iterator()
        while (it.hasNext) {
          val b = it.next()
          rows += b.getRowCount
          for ((name, dt) <- cols) {
            val chunk = {
              val cit = b.getColumns.iterator()
              var found: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
              while (cit.hasNext && found == null) {
                val c = cit.next()
                if (c.getPath.size() == 1 && c.getPath.toDotString == name)
                  found = c
              }
              found
            }
            if (chunk == null) return None // column not top-level in this file
            val st = chunk.getStatistics
            if (st == null) return None
            if (st.hasNonNullValue) {
              for (isMin <- Seq(true, false)) {
                val v = internalOf(if (isMin) st.genericGetMin else st.genericGetMax, dt)
                val k = (name, isMin)
                acc.get(k) match {
                  case None => acc(k) = v
                  case Some(prev) =>
                    val c = cmp(dt, v, prev)
                    if ((isMin && c < 0) || (!isMin && c > 0)) acc(k) = v
                }
              }
            } else if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount)) {
              // not provably all-null → stats unusable, never guess
              return None
            }
          }
        }
      } finally r.close()
    }
    Some((rows, acc.toMap))
  }

  // exactly the `supported` types — an unexpected type must fail loudly
  // here rather than survive on a dead branch (StringType deliberately
  // absent: the rule stands down on strings, see `supported`)
  private def internalOf(v: Any, dt: DataType): Any = dt match {
    case IntegerType | DateType => v.asInstanceOf[Number].intValue
    case LongType => v.asInstanceOf[Number].longValue
    case other => throw new IllegalStateException(
      s"MetadataMinMaxRewrite: unsupported type $other reached internalOf")
  }

  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case IntegerType | DateType =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case other => throw new IllegalStateException(
      s"MetadataMinMaxRewrite: unsupported type $other reached cmp")
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate
          if agg.groupingExpressions.isEmpty &&
            agg.aggregateExpressions.nonEmpty && {
              val specs = agg.aggregateExpressions.flatMap {
                case Alias(ae: AggregateExpression, _) => specOf(ae)
                case _ => None
              }
              specs.length == agg.aggregateExpressions.length
            } =>
        val specs = agg.aggregateExpressions.flatMap {
          case Alias(ae: AggregateExpression, _) => specOf(ae)
          case _ => None
        }
        val extremes = specs.collect { case e: Extreme => e }
        MetadataCountRewrite.bareParquetScan(agg.child) match {
          case Some(fs) if extremes.nonEmpty &&
              // partition columns are not in footers
              extremes.forall(e => !fs.partitionSchema.exists(_.name == e.name)) &&
              // every targeted column must be a data column of the scan
              extremes.forall(e => fs.dataSchema.exists(f =>
                f.name == e.name && f.dataType == e.dt)) =>
            footerFold(fs, extremes.map(e => (e.name, e.dt)).distinct) match {
              case Some((rows, ext)) =>
                val values = specs.map {
                  case CountStar => rows: Any
                  case Extreme(n, _, isMin) => ext.get((n, isMin)).orNull
                }
                LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
              case None => agg
            }
          case _ => agg
        }
    }
}
