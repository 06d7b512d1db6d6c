package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream–stream event-time interval join — the Structured
  * Streaming surface for correlating two LIVE feeds (e.g. the purchases
  * topic against the profile-updates topic a CDC deployment fans out,
  * README.md:30–32's "combine it with other streams" consumer).
  *
  * Semantics: an inner equi-join on `key` restricted to right rows whose
  * event time falls in `[leftTs - lookback, leftTs]`. Both sides carry
  * watermarks, so the state store retains only the lookback window of each
  * side — the property that makes the join runnable FOREVER at cluster
  * scale: state is O(rate × lookback), not O(history). A right row joins
  * left rows across micro-batch boundaries (buffered in state until the
  * watermark passes it) — pinned by the split-input spec.
  *
  * The composition is entirely built-in (withWatermark + join with an
  * event-time range conjunct — Spark plans StreamingSymmetricHashJoin);
  * the operator exists to fix the contract: column naming, the closed
  * interval, and the watermark discipline.
  */
object StreamStreamJoin {

  /** The joined stream. `right`'s key column is returned as `_r_<key>`-free:
    * only `left`'s key survives. Timestamp columns must be distinct names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame =
    intervalJoinTyped(left, right, key, leftTs, rightTs, lookback, watermark,
      "inner")

  /** LEFT OUTER stream–stream interval join: left rows that never found a
    * right match inside the lookback are emitted WITH NULLS — but only once
    * the watermark has passed the point where a match could still arrive
    * (the streaming engine cannot know "no match" earlier). That deferred
    * null emission is the whole subtlety of outer joins in the streaming
    * engine, and it means trailing left rows — those the watermark never
    * moves past because no later data arrives — stay in state unemitted at
    * AvailableNow termination. A production feed keeps flowing so the
    * watermark keeps moving; a BOUNDED drive must push the watermark past
    * its own tail (e.g. a far-future sentinel row on both sides, filtered
    * from the output) to collect the full outer result — the cdc28 gate
    * does exactly that.
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame =
    intervalJoinTyped(left, right, key, leftTs, rightTs, lookback, watermark,
      "left_outer")

  /** FULL OUTER stream–stream interval join: BOTH sides emit
    * watermark-proven null rows — unmatched left rows as in
    * [[intervalJoinLeftOuter]], and unmatched right rows (those no left row
    * ever picked up inside the lookback) with nulls on the left. The key
    * column is coalesced across sides so right-only rows keep their key.
    * Same bounded-drive caveat: the watermark must pass the tail (sentinel)
    * before trailing outer rows emit.
    */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame = {
    val rKey = s"_r_$key"
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(key, rKey).withWatermark(rightTs, watermark)
    l.join(r,
      col(key) === col(rKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      "full_outer")
      .withColumn(key, coalesce(col(key), col(rKey)))
      .drop(rKey)
  }

  /** Watermarked stream–stream AS-OF join: each left row is enriched with
    * the single NEWEST right row (by `rightTs`) of the same `key` whose
    * event time falls in `[leftTs - lookback, leftTs]` — the production
    * enrichment shape when the dimension ALSO streams (a purchases topic
    * joined to the newest preceding profile-update, README.md:30–32's
    * "combine it with other streams"), where [[intervalJoin]] would fan
    * out one row per candidate and a stream–static as-of
    * (CdcPipeline.enrichAsOf) would freeze the dimension.
    *
    * Composition — two chained stateful operators, both watermark-bounded:
    *   1. [[intervalJoinLeftOuter]] emits every in-window candidate pair
    *      (and, watermark-proven, a null row for match-less left rows);
    *   2. a windowed per-left-row aggregation picks the argmax candidate:
    *      `max(struct(rightTs, rightCols…))` — struct ordering compares
    *      fields left-to-right, so ties on `rightTs` resolve to the row
    *      greatest on `rightCols` IN THE GIVEN ORDER (callers put a unique
    *      id, e.g. the LSN, first to make the winner deterministic), and
    *      the all-null struct of a match-less row loses to any real
    *      candidate (null sorts first) — exactly left-outer as-of.
    *
    * Scale: state is O(rate × lookback) in the join plus O(rate ×
    * windowSize) in the aggregation — both evicted by the watermark, so
    * the query runs forever. The aggregation groups by `window(leftTs)`
    * PLUS every left column: the window makes the group watermark-
    * evictable (append-mode emission when the watermark passes it), the
    * left columns make the group one-left-row (left rows are unique in
    * practice; duplicates would collapse, as in any group-by).
    *
    * Bounded-drive caveat as for the outer joins: the watermark must pass
    * the tail (sentinel) before trailing rows emit.
    *
    * @param rightCols right payload columns to take from the winning row
    *                  (also the tie-break order after `rightTs`)
    * @param windowSize tumbling-window width for the argmax groups — any
    *                  value is semantically equivalent; it only tunes how
    *                  long groups wait for the watermark
    */
  /** @param maxStaleness optional tolerance (an INTERVAL string, e.g.
    *                      "1 HOUR"): the carried match is nulled when older
    *                      than the bound relative to the left event — sound
    *                      for the same reason as the batch operator's
    *                      `fresh` mode (the argmax carries the NEWEST
    *                      candidate; if it is stale, all are). Applied as a
    *                      stateless projection AFTER the windowed argmax,
    *                      so the streaming plan gains no state.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String, watermark: String,
      rightCols: Seq[String], windowSize: String = "24 hours",
      maxStaleness: Option[String] = None): DataFrame = {
    val joined = intervalJoinLeftOuter(left, right, key, leftTs, rightTs,
      lookback, watermark)
    val leftCols = left.columns.toSeq
    val best = struct((rightTs +: rightCols).map(col): _*)
    // the aggregation's event-time column is the WINDOW; the grouped copy
    // of leftTs must shed its watermark metadata or the output would carry
    // two event-time columns (rejected by the streaming planner)
    val plainTs = "_asof_lts"
    // null struct (no match) makes the condition null → when() yields null
    val keep = maxStaleness match {
      case None => lit(true)
      case Some(tol) =>
        col(s"_best.$rightTs") >= col(plainTs) - expr(s"INTERVAL $tol")
    }
    joined
      .withColumn(plainTs,
        col(leftTs).as(plainTs, org.apache.spark.sql.types.Metadata.empty))
      .groupBy(window(col(leftTs), windowSize).as("_w") +:
        leftCols.map(c => if (c == leftTs) col(plainTs) else col(c)): _*)
      .agg(max(best).as("_best"))
      .select(leftCols.map(c =>
        if (c == leftTs) col(plainTs).as(leftTs) else col(c)) ++
        rightCols.map(c => when(keep, col(s"_best.$c")).as(c)): _*)
  }

  private def intervalJoinTyped(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String, joinType: String): DataFrame = {
    val rKey = s"_r_$key"
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(key, rKey).withWatermark(rightTs, watermark)
    l.join(r,
      col(key) === col(rKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      joinType)
      .drop(rKey)
  }

  /** Drive a bounded streaming frame to completion (AvailableNow) into a
    * memory sink and return the materialized result — the gate/spec harness
    * for streaming operators. `maxFilesPerTrigger` splits file sources into
    * several micro-batches to exercise cross-batch state.
    */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
      outputMode: String = "append",
      statePartitions: Option[Int] = Some(8)): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"ssj_$name").toString
    // stateful-operator partition count is fixed at first checkpoint from
    // spark.sql.shuffle.partitions; a BOUNDED drive doesn't need the batch
    // session's fan-out, and every state partition pays store init + commit
    // per micro-batch — 8 keeps the gate fast without touching the session's
    // batch queries (restored immediately after start()).
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n))
    try {
      val q = streaming.writeStream.format("memory").queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }

  /** File-source STREAM over ANY parquet table path (documents ingest, or
    * any timestamp-less table). `maxFilesPerTrigger=0` means unlimited
    * (one batch).
    */
  def tableStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    // the file STREAM source requires a directory; a single-file input is
    // exposed through a temp dir holding a symlink (no data copy)
    val p = java.nio.file.Paths.get(path)
    val streamPath =
      if (java.nio.file.Files.isRegularFile(p)) {
        val dir = java.nio.file.Files.createTempDirectory("evstream")
        java.nio.file.Files.createSymbolicLink(dir.resolve(p.getFileName), p)
        dir.toString
      } else path
    val raw = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(raw)
    val withOpt = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    withOpt.parquet(streamPath)
  }

  /** [[eventsStream]] over a staging dir holding the events file (symlinked,
    * no copy) PLUS a far-future sentinel row per type in `sentinelTypes`
    * (event_id = user_id = −1, 30 days past the real max ts, written as a
    * second, newer file so `maxFilesPerTrigger = 1` lands it in a later
    * micro-batch). Purpose: a bounded drive of a watermark-gated operator
    * (outer join null emission, state eviction) must advance the watermark
    * past its own tail or the trailing results never leave state — the
    * sentinel is that final watermark push. Callers filter `user_id < 0`
    * out of the result. Handles both physical ts encodings the driver has
    * shipped (nanos-as-long and timestamp[us]) by doing the +30d arithmetic
    * in the file's own encoding before the stream-side fix applies.
    */
  def eventsStreamWithSentinel(spark: SparkSession, path: String,
      sentinelTypes: Seq[String], maxFilesPerTrigger: Int = 1): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    val dir = java.nio.file.Files.createTempDirectory("evsentinel")
    // bounded-drive scratch space: best-effort JVM-exit cleanup (the
    // streaming query reads it for the whole drive, so it cannot be
    // deleted any earlier; parents register before children so the
    // reverse-order exit deletion empties the dir first)
    dir.toFile.deleteOnExit()
    val link = dir.resolve(p.getFileName)
    java.nio.file.Files.createSymbolicLink(link, p)
    link.toFile.deleteOnExit()
    graft.Tables.withNanosProbe(spark)(spark.read.parquet(path)) { raw =>
      val isNanos =
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
      val plus30d =
        if (isNanos) col("_mts") + lit(30L * 86400L * 1000L * 1000L * 1000L)
        else col("_mts") + expr("INTERVAL 30 DAYS")
      raw.agg(max(col("ts")).as("_mts"))
        .select(explode(lit(sentinelTypes.toArray)).as("event_type"), col("_mts"))
        .select(lit(-1L).as("event_id"), plus30d.as("ts"),
          lit(-1L).as("user_id"), col("event_type"), lit(0.0).as("value"),
          lit(null).cast("string").as("props"))
        .coalesce(1).write.mode("append").parquet(dir.toString)
      (isNanos, raw)
    }
    eventsStream(spark, dir.toString, maxFilesPerTrigger)
  }

  /** [[tableStream]] over an events-style parquet path, with the same
    * ts-encoding fixes as the batch loader (graft.Tables.events): nanos-as-
    * long → µs truncation, or TIMESTAMP_NTZ → session-local timestamp —
    * whichever physical shape this testdata generation shipped.
    */
  def eventsStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.Tables.withNanosProbe(spark)(
      tableStream(spark, path, maxFilesPerTrigger)) { df =>
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (true, df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
        case _ =>
          (false, df.withColumn("ts", col("ts").cast("timestamp")))
      }
    }
}
