package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence/continuity audits — the two recurring "is anything missing?"
  * questions a changelog pipeline asks, as one operator:
  *
  *   - [[gaps]]: holes in a unique monotone id column (LSN, offset,
  *     invoice number) — the replication-integrity check that catches
  *     silent drops before they become missing state (the reference's
  *     consumers rely on WAL LSNs being dense per slot).
  *   - [[dailyCounts]]: the dense (key × day) activity matrix over the
  *     observed span with absent cells zero-filled — the calendar spine
  *     that turns "no row" into "a 0 a monitor can alert on".
  *
  * Both are scale-shaped for 100 TB: gaps ride [[GlobalRank.lead1]]'s
  * range-sharded lead (per-bucket window + one boundary handoff row per
  * bucket, never a single-partition window over all ids); the day spine
  * is generated from a 1-row span aggregate (`explode(sequence(...))` —
  * O(days), never a row-range join), and the fill join is a left join on
  * (key, day) against the already-aggregated actuals.
  */
object SequenceAudit {

  /** Holes in the unique integer column `seqCol`: one row per gap,
    * (gap_after, gap_len) — gap_after is the last present id before the
    * hole. Duplicate ids are tolerated (audited distinct).
    */
  def gaps(df: DataFrame, seqCol: String, nBuckets: Int = 64): DataFrame =
    GlobalRank.lead1(df.select(col(seqCol)).distinct(), seqCol, "_nxt",
        nBuckets)
      .filter(col("_nxt") - col(seqCol) > 1)
      .select(col(seqCol).as("gap_after"),
        (col("_nxt") - col(seqCol) - 1).as("gap_len"))

  /** Per-key daily event counts over the FULL observed day span: every
    * (distinct key tuple × day in [min day, max day]) cell, zero when no
    * event landed. `tsCol` is any timestamp/date expression. Output:
    * keyCols ++ (day DATE, n LONG).
    *
    * Null handling: NULL key tuples are first-class — the fill join is
    * null-safe (`<=>`), so a null key's counts land in its cells rather
    * than zeroing out. Rows whose `tsCol` is NULL have no calendar day and
    * are excluded from both the span and the counts (a null day is not a
    * cell a monitor can alert on).
    */
  def dailyCounts(df: DataFrame, keyCols: Seq[String], tsCol: Column)
      : DataFrame = {
    require(keyCols.nonEmpty, "dailyCounts needs at least one key column")
    val withDay = df.select((keyCols.map(col) :+
      to_date(tsCol).as("day")): _*)
    val span = withDay.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
    val days = span.select(explode(
      sequence(col("_d0"), col("_d1"), expr("interval 1 day"))).as("day"))
    val keys = withDay.select(keyCols.map(col): _*).distinct()
    val actual = withDay.filter(col("day").isNotNull)
      .groupBy((keyCols :+ "day").map(col): _*)
      .agg(count(lit(1)).as("_n"))
    // `days` is O(span) rows off a one-row aggregate with no stats; left
    // unhinted the planner could build on the data-proportional KEYS side
    // (the vec39 inversion). The spine's |keys|·|days| output size is the
    // gap-fill contract — only the build side needs pinning.
    val spine = keys.crossJoin(broadcast(days)).as("_s")
    val a = actual.as("_a")
    // null-safe on the keys so null-keyed rows keep their counts; day is
    // plain equality (the spine never holds a null day)
    val cond = keyCols.map(c => col(s"_s.$c") <=> col(s"_a.$c"))
      .reduce(_ && _) && col("_s.day") === col("_a.day")
    spine.join(a, cond, "left")
      .select((keyCols.map(c => col(s"_s.$c")) :+ col("_s.day").as("day") :+
        coalesce(col("_a._n"), lit(0L)).as("n")): _*)
  }
}
