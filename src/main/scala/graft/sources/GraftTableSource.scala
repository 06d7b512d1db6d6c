package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.cdc.MaterializedTable

/** `spark.read.format("graft").load(dir)` — the materialized-table storage
  * layer as a first-class Spark data source, so plain DataFrame/SQL
  * consumers get the manifest's bucket skipping WITHOUT calling the
  * library API: a relation with `PrunedFilteredScan`, whose scan
  * translates the pushed-down V1 filters into the stats layer's pruning
  * predicate ([[MaterializedTable.readPruned]]) — buckets whose recorded
  * min/max cannot satisfy the filters are never LISTED.
  *
  * Correctness is double-guarded: the translated conjuncts only remove
  * IO (readPruned re-applies them), and every filter is also declared
  * `unhandledFilters`, so Spark re-evaluates the ORIGINAL predicates
  * above the scan — a translation gap can never change results, only
  * forgo skipping (the same conservative stance the stats layer takes
  * everywhere).
  *
  * The relation resolves the manifest at SCAN time, so each query reads
  * the current committed snapshot (the single-writer freshness contract
  * of the storage layer). Time travel and group pins stay library calls
  * (`readVersion` / `TableGroup.read`) — they name a version, which a
  * bare path cannot.
  */
class GraftTableSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft source needs a path: spark.read.format(\"graft\").load(dir)"))
    new GraftTableRelation(ctx, dir)
  }
}

class GraftTableRelation(ctx: SQLContext, dir: String)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  override val schema: StructType = {
    val (_, full) = MaterializedTable.keyLayout(ctx.sparkSession, dir)
    StructType(full.filterNot(_.name == "_bucket"))
  }

  /** V1 filter → pruning predicate. Only shapes the stats layer can use
    * for skipping translate; anything else contributes no constraint
    * (Spark re-applies every filter above the scan regardless).
    */
  private def pruningColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case And(l, r) => (pruningColumn(l), pruningColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other) => one.orElse(other) // a one-sided AND still prunes
    }
    case _ => None // OR / IN / null tests / string ops: no skipping claim
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters // Spark re-evaluates everything above the scan — see scaladoc

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = ctx.sparkSession
    val pred = filters.flatMap(pruningColumn).reduceOption(_ && _)
    val base = pred match {
      case Some(p) => MaterializedTable.readPruned(spark, dir, p)
      case None => MaterializedTable.read(spark, dir)
    }
    // an empty projection (COUNT(*) pushdown shape) still needs row arity
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}
