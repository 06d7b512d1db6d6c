package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** One signed aggregate delta: retractions carry dn = -1 and a negated
  * value; additions dn = +1. `dv` is None when the version's value is null
  * (contributes to the count, not the sum) — mirroring SQL SUM semantics.
  */
final case class AggDelta(grp: String, dn: Long, dv: Option[BigDecimal])

/** Incremental maintenance of grouped aggregates from a keyed changelog —
  * the retract-stream algebra of incremental view maintenance: every change
  * event is translated into at most two signed DELTA rows
  * (retract the key's previous contribution, add its new one), and the
  * grouped SUM/COUNT of the deltas equals the aggregate over the compacted
  * latest state. No latest-state materialization, no join-back.
  *
  * Why it matters at 100 TB: `LatestState.batch` + re-aggregate recomputes
  * the whole aggregate from all history every time; the delta form is a
  * single linear pass whose grouped sum can be UNIONED with a previously
  * persisted aggregate — new micro-batch deltas fold into the standing
  * result without touching old events (the algebra downstream consumers of
  * the reference's topics implement by hand; README.md:30–32 "calculate
  * analytics"). The per-event transition rule:
  *
  *   was_live = previous event for the key exists and is not a delete
  *   is_live  = this event is not a delete
  *   emit  (prev_group, -1, -prev_value)  if was_live   (retraction)
  *   emit  (group,      +1, +value)       if is_live    (addition)
  *
  * which handles insert, value-update, REGROUP (group column change moves
  * the contribution between groups), delete, and post-delete re-insert in
  * one rule. Values are summed as exact decimals (Qutil.dsum rationale:
  * double sums are order-dependent; decimal sums are exact, so the delta
  * order — inherently nondeterministic under shuffles — cannot change the
  * result, and retractions cancel additions EXACTLY).
  *
  * Plan shape: one hash exchange on the key columns (the `lag` window — each
  * event ships once), then a partial-aggregated exchange on the group column
  * of O(2·events) skinny delta rows. Both are inherent: the previous version
  * of a key lives wherever that key hashes.
  */
object IncrementalAgg {

  /** Maintain `(n_live, sum_value)` per group from a changelog.
    *
    * @param changelog rows with key columns, ordering columns, an op column
    * @param keyCols   primary-key columns
    * @param orderCols commit-order columns, e.g. (lsn, seq)
    * @param groupExpr expression assigning each row-version to a group (may
    *                  change across versions of a key — regroup is handled)
    * @param valueExpr numeric expression to sum (read from the row-version;
    *                  only consulted on live versions)
    * @param scale     decimal scale for the exact value sum
    * @return one row per group with a live contribution:
    *         (grp, n_live BIGINT, sum_value DOUBLE)
    */
  def sumCount(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      groupExpr: Column,
      valueExpr: Column,
      opCol: String = "op",
      scale: Int = 4): DataFrame = {
    val deltas = deltaRows(changelog, keyCols, orderCols, groupExpr, valueExpr, opCol, scale)
    deltas
      .groupBy(col("grp"))
      .agg(sum(col("dn")).as("n_live"),
        sum(col("dv")).cast("double").as("sum_value"))
      // a fully-retracted group (every key deleted or regrouped away) nets to
      // zero rows live — drop it, matching an aggregate over latest state
      .filter(col("n_live") > 0)
  }

  /** The signed delta stream itself: (grp, dn ∈ {-1,+1}, dv DECIMAL).
    * Exposed so a caller can fold deltas into a persisted standing aggregate
    * (`standing UNION ALL deltas` re-aggregated) instead of rebuilding.
    */
  def deltaRows(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      groupExpr: Column,
      valueExpr: Column,
      opCol: String = "op",
      scale: Int = 4): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(orderCols.map(col).toIndexedSeq: _*)
    val dec = DecimalType(18, scale)
    val grp = groupExpr
    val dv = valueExpr.cast(dec)
    changelog
      .withColumn("_is_live", col(opCol) =!= Op.Delete)
      .withColumn("_grp", grp)
      .withColumn("_dv", dv)
      .withColumn("_was_live", coalesce(lag(col("_is_live"), 1).over(w), lit(false)))
      .withColumn("_prev_grp", lag(col("_grp"), 1).over(w))
      .withColumn("_prev_dv", lag(col("_dv"), 1).over(w))
      .select(explode(array(
        when(col("_was_live"),
          struct(col("_prev_grp").as("grp"), lit(-1L).as("dn"),
            (-col("_prev_dv")).as("dv"))),
        when(col("_is_live"),
          struct(col("_grp").as("grp"), lit(1L).as("dn"), col("_dv").as("dv")))
      )).as("d"))
      .filter(col("d").isNotNull)
      .select(col("d.grp").as("grp"), col("d.dn").as("dn"), col("d.dv").as("dv"))
  }

  /** Net signed deltas of a micro-batch AGAINST a persisted prior state —
    * the cross-batch form of [[deltaRows]] (whose lag() window can only see
    * versions INSIDE the batch; the prior version of a key that last moved
    * three batches ago lives in the materialized state, which is exactly
    * what this consults): retract the key's persisted contribution, add its
    * batch-final one. Mid-batch churn cancels internally (the batch
    * compacts to its last version per key first), so the output is ≤2 rows
    * per DISTINCT KEY in the batch — O(batch), never O(state).
    *
    * @param prior  live latest-state rows (one per key, payload columns
    *               readable by `groupExpr`/`valueExpr`) — e.g.
    *               [[MaterializedTable.read]] of the standing state. Only
    *               the batch's keys are consulted (semi-join shape).
    * Contract: fold batches in commit order and merge `batch` into the
    * state AFTER computing its deltas; then
    * `foldStanding(deltas(batch_i)) for all i` ≡ `sumCount(whole changelog)`
    * (spec-pinned). The cdc44 gate runs this loop end-to-end.
    */
  def deltasAgainstState(prior: DataFrame, batch: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String],
      groupExpr: Column, valueExpr: Column,
      opCol: String = "op", scale: Int = 4): DataFrame = {
    val dec = DecimalType(18, scale)
    val last = LatestState.batch(batch, keyCols, orderCols, opCol,
      keepDeleted = true)
    // keys only from the batch side: the joined row's payload is PRIOR's,
    // so groupExpr/valueExpr read the key's persisted version unambiguously
    val retract = last.select(keyCols.map(col): _*)
      .join(prior, keyCols)
      .select(groupExpr.as("grp"), lit(-1L).as("dn"),
        (-valueExpr.cast(dec)).as("dv"))
    val add = last.filter(col(opCol) =!= Op.Delete)
      .select(groupExpr.as("grp"), lit(1L).as("dn"),
        valueExpr.cast(dec).as("dv"))
    retract.unionByName(add)
  }

  /** Streaming twin of [[deltaRows]]: per-key state holds the newest version
    * seen; each arriving event that ADVANCES (lsn, seq) emits its retract/add
    * deltas (Append mode — deltas are immutable facts, never updated). The
    * standing aggregate is then maintained by folding each micro-batch's
    * deltas into a persisted (grp, n_live, sum_value) table in the sink
    * (`foreachBatch` upsert) — old events are never re-read, which is the
    * point of IVM on a 100 TB changelog.
    *
    * At-least-once safety (CDC replays, kafka/bottledwater.c:683–687): an
    * event that does not advance the stored (lsn, seq) emits NOTHING — a
    * replayed event re-emitting its deltas would double-count in every
    * downstream fold. Same newer-of discipline as [[LatestState.streaming]].
    *
    * @param groupOf group of a version (from its payload); consulted only on
    *                live versions
    * @param valueOf exact-decimal value of a version, None if null
    */
  def streamingDeltas(events: Dataset[CdcEvent],
      groupOf: CdcEvent => String,
      valueOf: CdcEvent => Option[BigDecimal]): Dataset[AggDelta] = {
    import events.sparkSession.implicits._
    events
      .filter(e => Op.rowOps.contains(e.op))
      .groupByKey(e => (e.table, e.key))
      .flatMapGroupsWithState[CdcEvent, AggDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[CdcEvent]) =>
          val out = Seq.newBuilder[AggDelta]
          var prev = state.getOption.orNull
          // events of one key within a micro-batch must apply in commit order
          batch.toSeq.sortBy(e => (e.lsn, e.seq)).foreach { e =>
            val advances = prev == null ||
              e.lsn > prev.lsn || (e.lsn == prev.lsn && e.seq > prev.seq)
            if (advances) {
              if (prev != null && prev.op != Op.Delete)
                out += AggDelta(groupOf(prev), -1L, valueOf(prev).map(v => -v))
              if (e.op != Op.Delete)
                out += AggDelta(groupOf(e), 1L, valueOf(e))
              prev = e
            }
          }
          if (prev != null) state.update(prev)
          out.result().iterator
      }
  }

  /** Fold one batch of deltas into the STANDING aggregate table at `dir` —
    * (grp, n_live, sum_value) parquet, hash-bucketed on grp via
    * [[MaterializedTable.mergeBuckets]]: only buckets touched by this
    * batch's groups are read and rewritten, and a group retracted to zero
    * disappears (its bucket's stale files are deleted when emptied).
    *
    * This is the IVM composition end-to-end: `streamingDeltas → foreachBatch
    * { foldStanding }` maintains a queryable aggregate from a live changelog
    * at O(batch + touched buckets) per trigger — the historical changelog is
    * never re-read. Values stay exact decimals in storage (sums of deltas
    * must cancel bit-exactly); cast at read time if doubles are wanted.
    */
  def foldStanding(spark: org.apache.spark.sql.SparkSession, dir: String,
      deltas: DataFrame, numBuckets: Int = 64,
      batchId: Option[Long] = None): Int = {
    val dec = DecimalType(28, 4)
    val contrib = deltas.select(col("grp"),
      col("dn").as("n_live"), col("dv").cast(dec).as("sum_value"))
    MaterializedTable.mergeBuckets(spark, dir, contrib, Seq("grp"), numBuckets,
      batchId) {
      combined =>
        combined.groupBy(col("_bucket"), col("grp"))
          .agg(sum(col("n_live")).as("n_live"),
            sum(col("sum_value")).cast(dec).as("sum_value"))
          .filter(col("n_live") > 0)
    }
  }

  /** [[foldStanding]] guarded for foreachBatch's at-least-once BATCH retry:
    * folding the same deltas twice would double-count, so each applied batch
    * id leaves a marker file and a retry of an already-folded batch is a
    * no-op. (Replayed EVENTS are already silent — [[streamingDeltas]] emits
    * nothing for non-advancing replays; this closes the batch-level half.)
    *
    * Exactly-once: the batch id also rides into the standing table's
    * manifest ([[MaterializedTable.mergeBuckets]]'s watermark), which
    * commits in the SAME atomic rename as the data — so even a crash after
    * the fold but before the marker write cannot double-fold on retry (the
    * manifest guard catches it). The marker file is a read-free fast path;
    * markers are O(batches) empty files, prunable up to the checkpoint's
    * committed id.
    */
  def foldStandingBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
      deltas: DataFrame, batchId: Long, numBuckets: Int = 64): Int = {
    MaterializedTable.checkStandingFoldRetention(spark, dir,
      "IncrementalAgg.foldStandingBatch")
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_applied/$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return 0
    // bounded retry on a lost optimistic commit (maintenance racing the
    // stream): the fold is watermark-guarded, so the retry converges — the
    // streaming query survives instead of dying to a retryable race
    val n = MaterializedTable.withCommitRetry(spark) {
      foldStanding(spark, dir, deltas, numBuckets, Some(batchId))
    }
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    n
  }

  /** Prune [[foldStandingBatch]] markers BELOW `committedBatchId` (exclusive)
    * — safe once the streaming checkpoint has committed that id, because
    * foreachBatch only ever retries the latest uncommitted batch; ids below
    * the committed watermark can never be re-delivered. Keeps the marker
    * directory O(1) instead of O(stream lifetime). Returns markers deleted.
    */
  def pruneMarkers(spark: org.apache.spark.sql.SparkSession, dir: String,
      committedBatchId: Long): Int = {
    val applied = new org.apache.hadoop.fs.Path(s"$dir/_applied")
    val fs = applied.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(applied)) return 0
    val old = fs.listStatus(applied).filter(st =>
      scala.util.Try(st.getPath.getName.toLong).toOption.exists(_ < committedBatchId))
    old.foreach(st => fs.delete(st.getPath, true))
    old.length
  }

  /** Current standing aggregate (bucket column dropped). */
  def readStanding(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    MaterializedTable.read(spark, dir)
}
