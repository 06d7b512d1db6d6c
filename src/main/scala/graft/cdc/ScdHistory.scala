package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One CLOSED row-version from the streaming SCD2 path: the payload of the
  * superseded version plus its validity interval in commit order. Open
  * (current) versions live in the state store until the event that closes
  * them arrives.
  */
final case class ClosedVersion(
    table: String, key: String,
    valid_from_lsn: Long, valid_from_seq: Long,
    valid_to_lsn: Long, valid_to_seq: Long,
    op: String, after: String)

/** Slowly-changing-dimension (type 2) materialization: turn a keyed changelog
  * into full VERSION HISTORY — one row per row-version, stamped with its
  * validity interval `[valid_from, valid_to)` in commit order and an
  * `is_current` flag.
  *
  * This is the other classic consumer of the reference's compacted topics
  * (README.md:30–32 "load it into a data warehouse"): where [[LatestState]]
  * reconstructs the present, SCD2 retains the past — every update closes the
  * previous version and opens a new one; a delete closes the last version
  * without opening another (the interval end IS the tombstone's LSN, so a
  * deleted key has no open version and `is_current` is false everywhere).
  *
  * Scale design: output is O(events) by definition (every insert/update is a
  * version), so the single hash exchange on the key columns + per-partition
  * sort that `lead()` needs is the minimal plan — nothing is shuffled twice,
  * and no state beyond one partition's sort buffer is held. Contrast with a
  * latest-state-then-join-back formulation, which would shuffle the changelog
  * twice. At 100 TB the exchange ships each event exactly once.
  */
object ScdHistory {

  /** @param changelog rows with key columns, ordering columns, an op column
    * @param keyCols   primary-key columns (≙ tuple_to_avro_key projection,
    *                  ext/oid2avro.c:221–260)
    * @param orderCols commit-order columns, e.g. (lsn, seq) — total order per key
    * @return all insert/update versions with `valid_to` (STRUCT of the order
    *         columns of the NEXT event for the key; null = open interval) and
    *         `is_current` (open interval ⇒ the key's live version)
    */
  def batch(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(orderCols.map(col).toIndexedSeq: _*)
    val nextOrd: Column = lead(struct(orderCols.map(col).toIndexedSeq: _*), 1).over(w)
    changelog
      .withColumn("valid_to", nextOrd)
      .withColumn("is_current", col("valid_to").isNull && col(opCol) =!= Op.Delete)
      // deletes CLOSE the previous version (their order key is its valid_to,
      // already captured by lead) but are not versions themselves
      .filter(col(opCol) =!= Op.Delete)
  }

  /** Streaming twin of [[batch]]: versions are emitted AS THEY CLOSE (Append
    * mode — a closed interval is an immutable fact). Per-key state holds the
    * newest version; an arriving event that ADVANCES (lsn, seq) closes the
    * stored live version at its own (lsn, seq) and becomes the new state.
    * Deletes close without becoming versions; non-advancing replays
    * (at-least-once delivery) emit nothing — a re-emitted closed interval
    * would duplicate rows in every append sink downstream.
    *
    * The history table is then `sink(closed) ∪ current-state`: exactly the
    * split a warehouse wants — closed versions append-only into immutable
    * storage, open versions in the (small) hot state.
    */
  def streamingClosedVersions(events: Dataset[CdcEvent]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events
      .filter(e => Op.rowOps.contains(e.op))
      .groupByKey(e => (e.table, e.key))
      .flatMapGroupsWithState[CdcEvent, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[CdcEvent]) =>
          val out = Seq.newBuilder[ClosedVersion]
          var prev = state.getOption.orNull
          batch.toSeq.sortBy(e => (e.lsn, e.seq)).foreach { e =>
            val advances = prev == null ||
              e.lsn > prev.lsn || (e.lsn == prev.lsn && e.seq > prev.seq)
            if (advances) {
              if (prev != null && prev.op != Op.Delete)
                out += ClosedVersion(prev.table, prev.key, prev.lsn, prev.seq,
                  e.lsn, e.seq, prev.op, prev.after)
              prev = e
            }
          }
          if (prev != null) state.update(prev)
          out.result().iterator
      }
  }

  /** foreachBatch sink for [[streamingClosedVersions]]: land the micro-batch's
    * closed versions in the history table at `dir`, IDEMPOTENTLY under
    * foreachBatch's at-least-once batch retries. Rows go into a
    * `_batch=<id>` partition and a retried batch dynamically overwrites ONLY
    * its own partition — a sink failure mid-write can never double-append.
    * (The stream side already guarantees replayed EVENTS emit nothing;
    * this closes the other half: replayed BATCHES.) Closed intervals are
    * immutable facts, so append-only partitions are the right storage — no
    * merge dataflow, no compaction coupling; `MaterializedTable.compact`
    * applies unchanged if small batches accumulate small files.
    */
  def foldHistory(spark: org.apache.spark.sql.SparkSession, dir: String,
      closed: DataFrame, batchId: Long): Unit = {
    closed.withColumn("_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch")
      .parquet(dir)
  }

  /** Bounded drive of the streaming SCD2 path: run `closed` to completion
    * (AvailableNow), folding each micro-batch's closed versions into the
    * history table at `dir` via [[foldHistory]]. The full SCD2 table is then
    * `readHistory(dir) ∪ openVersions(latest)` — closed versions from
    * immutable append-only storage, open versions from the compacted present.
    */
  def foldToHistory(closed: Dataset[ClosedVersion], dir: String,
      checkpointLocation: Option[String] = None): Unit = {
    val spark = closed.sparkSession
    // deterministic checkpoint under the history dir: batch ids stay
    // monotonic across invocations (a fresh temp checkpoint would restart
    // at _batch=0 and dynamically overwrite prior closed versions)
    val ckpt = checkpointLocation.getOrElse(s"$dir/_graft_checkpoint")
    val q = closed.toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldHistory(spark, dir, batch, id)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The folded closed-version history (batch column dropped). An empty or
    * not-yet-written history reads as an empty [[ClosedVersion]] relation —
    * the first micro-batches of a fresh pipeline close nothing (every key is
    * a first insert), and `readHistory ∪ openVersions` must already work
    * then, not throw schema-inference errors on a parquet-less directory.
    */
  def readHistory(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.startsWith("_batch="))
    if (hasData) spark.read.parquet(dir).drop("_batch")
    else spark.emptyDataset[ClosedVersion].toDF()
  }

  /** Open (current) versions in [[ClosedVersion]] shape (null valid_to),
    * derived from compacted latest state ([[LatestState.batch]] output over
    * the same changelog). `readHistory ∪ openVersions` is the full SCD2
    * table — closed versions from immutable storage, open versions from the
    * (small) compacted present.
    */
  def openVersions(latest: DataFrame): DataFrame =
    latest.select(col("table"), col("key"),
      col("lsn").as("valid_from_lsn"), col("seq").as("valid_from_seq"),
      lit(null).cast("long").as("valid_to_lsn"),
      lit(null).cast("long").as("valid_to_seq"),
      col("op"), col("after"))

  /** TEMPORAL ALIGNMENT of two SCD2 histories on a shared key — the
    * bitemporal "what did A and B say SIMULTANEOUSLY" join (SQL:2011 temporal
    * join; what a warehouse runs to reconstruct a consistent wide row for any
    * point in commit history). For every pair of same-key versions whose
    * validity intervals intersect, one output row covers the intersection:
    * `valid_from = greatest(a.from, b.from)`,
    * `valid_to = least(a.to, b.to)` with a null (open) end treated as +∞ —
    * both engines' least/greatest skip nulls, so `least` IS the null-as-∞
    * minimum. Within a key the output intervals tile each overlap region
    * disjointly, because each input side's intervals are disjoint.
    *
    * Input contract: each frame has `keyCols`, orderable `valid_from` and
    * nullable `valid_to` columns (the STRUCT-of-order-columns shape
    * [[batch]] emits), and otherwise-disjoint payload columns (project
    * before calling). Payload travels verbatim — no arithmetic, so the
    * output is engine-exact.
    *
    * Scale shape: ONE hash equi-join on the key columns; the interval
    * intersection is a residual predicate evaluated inside the joined key
    * group, so the exchange ships each version exactly once and no
    * interval-driven blowup crosses the wire. Per-key cost is
    * O(versions_A · versions_B) pre-filter — bounded by per-key update
    * counts, the quantity SCD2 histories are sized by anyway. (For
    * key-less interval joins use the range-join machinery instead —
    * [[graft.plans.RangeJoinRewrite]].)
    */
  def alignHistories(histA: DataFrame, histB: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val meta = Set("valid_from", "valid_to") ++ keyCols
    val payloadA = histA.columns.filterNot(meta)
    val payloadB = histB.columns.filterNot(meta)
    val clash = payloadA.toSet.intersect(payloadB.toSet)
    require(clash.isEmpty, s"payload columns must be disjoint: $clash")
    val a = histA.alias("ha")
    val b = histB.alias("hb")
    val cond = keyCols.map(k => col(s"ha.$k") === col(s"hb.$k")).reduce(_ && _) &&
      (col("hb.valid_to").isNull || col("ha.valid_from") < col("hb.valid_to")) &&
      (col("ha.valid_to").isNull || col("hb.valid_from") < col("ha.valid_to"))
    a.join(b, cond)
      .select(keyCols.map(k => col(s"ha.$k").as(k)) ++ Seq(
        greatest(col("ha.valid_from"), col("hb.valid_from")).as("valid_from"),
        least(col("ha.valid_to"), col("hb.valid_to")).as("valid_to")) ++
        payloadA.map(c => col(s"ha.$c")).toSeq ++
        payloadB.map(c => col(s"hb.$c")).toSeq: _*)
  }
}
