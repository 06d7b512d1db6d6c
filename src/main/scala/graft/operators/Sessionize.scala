package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: group each entity's event sequence into
  * sessions separated by inactivity gaps longer than `gap`.
  *
  * The classic warehouse consumer of a CDC event stream (the reference's own
  * motivation list — "calculate analytics", README.md:30–32): a session is a
  * maximal run of events where consecutive gaps are ≤ `gap`.
  *
  * Shape: ONE hash exchange on `partitionCols`. The lag(), the running sum,
  * and any downstream per-(entity, session) aggregate all cluster on a
  * prefix of (partitionCols, session) — Spark's HashPartitioning(entity)
  * satisfies ClusteredDistribution(entity, session) — so the whole
  * sessionize-then-aggregate dataflow is a single shuffle of O(events),
  * which is the floor (every event must reach its entity's reducer once).
  * At 100 TB the only scale limit is the largest single entity's event
  * count (one entity = one task's sort), the same bound as any windowed
  * per-entity analytic.
  *
  * `timeCol` must be a numeric column (e.g. epoch micros) and `gap` is in
  * the same unit: integer arithmetic only, so session boundaries are
  * bit-deterministic across engines — no timestamp-interval semantics in
  * the hot path (and the DuckDB oracle restates it on epoch_us integers).
  */
object Sessionize {

  /** Assign a per-entity 1-based `session_no` to every row.
    *
    * @param tieBreak  extra ordering columns making the per-entity order
    *                  total (a non-deterministic order would make session
    *                  numbering run-dependent under equal timestamps)
    */
  def assign(df: DataFrame, partitionCols: Seq[String], timeCol: Column,
      tieBreak: Seq[Column], gap: Long,
      sessionCol: String = "session_no"): DataFrame = {
    require(gap >= 0, s"gap must be non-negative, got $gap")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(timeCol +: tieBreak: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(timeCol, 1).over(w)
    // two projections because window functions cannot nest — both Window
    // operators share the same partitioning, so still one exchange
    df.withColumn("_new_session",
        when(prev.isNull || timeCol - prev > gap, 1L).otherwise(0L))
      .withColumn(sessionCol, sum(col("_new_session")).over(run))
      .drop("_new_session")
  }
}
