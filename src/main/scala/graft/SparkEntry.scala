package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 surfaces here as a named query;
  * queries with a DuckDB-expressible equivalent also publish oracle SQL for
  * the driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** All declared-surface queries from every module. */
  def allQs: Seq[Q] = {
    val qs = RelationalQueries.defs ++ CdcQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs
    // .toMap below would SILENTLY drop one of two same-named queries — a
    // copy-paste slip would shrink the correctness gate with zero signal
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
