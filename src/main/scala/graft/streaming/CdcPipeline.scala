package graft.streaming

import graft.cdc._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** End-to-end CDC pipeline wiring — the Spark re-expression of the
  * reference's producer main loop (kafka/bottledwater.c:867–907 +
  * SURVEY §3.1/3.2):
  *
  *   snapshot (batch, xid=0) ∪ stream (readStream) → error policy guard →
  *   update split → latest-state compaction → per-table sink
  *
  * The reference hand-builds backpressure, txn tracking, and LSN
  * checkpointing; here Trigger/maxFilesPerTrigger, the state store, and the
  * streaming checkpoint directory provide them (SURVEY §4 table).
  */
object CdcPipeline {

  /** Consistent snapshot of a batch table as synthetic xid=0 insert envelopes
    * (client/connect.c:356–362: the snapshot rides as one synthetic
    * transaction) with lsn pinned below the stream's starting LSN.
    */
  def snapshotEnvelopes(table: DataFrame, tableName: String, keyCols: Seq[String],
      snapshotLsn: Long = 0L): Dataset[CdcEvent] = {
    val spark = table.sparkSession
    import spark.implicits._
    val keyJson = to_json(struct(keyCols.map(col): _*))
    // names enter the pipeline here from a non-Postgres caller: the source
    // contract a real PG upstream enforces is the 63-byte NAMEDATALEN clip.
    // A longer name is caller error worth surfacing — clipping silently
    // would make later `table = <original>` filters match nothing — so
    // require instead of truncate (the reference never sees such a name;
    // PG itself truncates at DDL time, before any decoding).
    val pgName = graft.functions.AvroSafeName.pgTruncateIdentifier(tableName)
    require(pgName == tableName,
      s"table name exceeds PostgreSQL's 63-byte identifier limit " +
        s"(would truncate to '$pgName'): '$tableName'")
    table.select(
      lit(Op.Insert).as("op"),
      lit(pgName).as("table"),
      lit(snapshotLsn).as("lsn"),
      lit(0L).as("xid"),
      // seq can be constant: snapshot keys are unique, so (lsn, seq) never
      // ties within a key — and a global row_number() would force a
      // single-partition sort at scale.
      lit(0L).as("seq"),
      keyJson.as("key"),
      lit(null).cast("string").as("before"),
      to_json(struct(table.columns.map(col).toIndexedSeq: _*)).as("after"))
      .as[CdcEvent]
  }

  /** The full streaming pipeline from an envelope stream: guard → split →
    * compact. Returns the compacted Update-mode stream of per-key latest
    * states.
    *
    * @param oldKeyOf extractor for the OLD KEY of an update (for key-change
    *   splitting). The envelope's `before` holds the old ROW, not the old
    *   key, so no extractor can be defaulted from it — sources that track
    *   key changes must supply one; the default (null) disables splitting.
    */
  def latestStateStream(envelopes: Dataset[CdcEvent],
      policy: ErrorPolicy = ErrorPolicy.Exit,
      maxRecordBytes: Int = PgTypes.MaxRecordBytes,
      oldKeyOf: CdcEvent => String = _ => null): Dataset[CdcEvent] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    val guarded = ErrorPolicy.maxRecordSize(
      envelopes.toDF(), "after", policy, maxRecordBytes).as[CdcEvent]
    val split = UpdateSplit(guarded, oldKeyOf)
    LatestState.streaming(split)
  }

  /** Route a compacted stream into per-table materialized state (the engine's
    * "topic per table", kafka/bottledwater.c:386–415): `foreachBatch` demuxes
    * each micro-batch by table and MERGEs it into that table's bucketed state
    * directory via [[MaterializedTable.merge]] — tombstones delete keys, and
    * a replayed micro-batch (restart after partial failure) re-merges
    * idempotently because compaction by (lsn, seq) is.
    *
    * Table directories are avro-sanitized WITHOUT pre-replacing '.', so
    * `public.users` → `public_2e_users` and cannot collide with a table
    * literally named `public_users`.
    */
  /** @param statsCols columns to record per-bucket min/max/null statistics
    *   for in each table's manifest (MaterializedTable's data-skipping
    *   layer: metadata-only aggregates, pruned range reads, point lookups).
    *   Free at write time — the stats ride the grouped pass every merge
    *   already pays. Columns absent from a table are skipped per table.
    */
  def writeLatestState(compacted: Dataset[CdcEvent], outDir: String,
      checkpointDir: String,
      statsCols: Seq[String] = Seq("lsn")): DataStreamWriter[org.apache.spark.sql.Row] = {
    // CUMULATIVE relid-collision check: the foreachBatch closure lives on the
    // driver for the query's lifetime and batches run sequentially, so this
    // set accumulates every table ever seen — a collision between tables
    // first appearing in DIFFERENT micro-batches still fails loudly (a
    // batch-local check would pass each batch individually). Scope: one
    // query run, like the reference's per-connection schema announcements.
    val seenTables = scala.collection.mutable.Set[String]()
    compacted.toDF().writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist() // one materialization feeds the demux + every merge
        try {
          val tables = batch.select("table").distinct().collect().map(_.getString(0))
          seenTables ++= tables
          AvroFrame.validateRelids(seenTables.toSeq)
          for (t <- tables) {
            val safe = graft.functions.AvroSafeName.sanitize(t)
            MaterializedTable.merge(batch.sparkSession, s"$outDir/$safe",
              batch.filter(col("table") === t), Seq("table", "key"),
              Seq("lsn", "seq"), statsCols = statsCols)
          }
        } finally batch.unpersist()
      }
  }

  /** `--skip-snapshot` mode (spec/functional/snapshot_spec.rb:47–61 +
    * client/connect.c: the snapshot step is simply not taken): enter
    * streaming directly, so pre-existing table contents are NEVER emitted —
    * only changes arriving after the stream starts. Compositionally this is
    * [[latestStateStream]] without the snapshotEnvelopes ∪ stream cold start
    * of SURVEY §3.1; it exists as a named mode so the lifecycle choice is an
    * explicit API decision, not an implicit wiring difference.
    */
  def streamOnly(stream: Dataset[CdcEvent],
      policy: ErrorPolicy = ErrorPolicy.Exit,
      maxRecordBytes: Int = PgTypes.MaxRecordBytes,
      oldKeyOf: CdcEvent => String = _ => null): Dataset[CdcEvent] =
    latestStateStream(stream, policy, maxRecordBytes, oldKeyOf)

  /** Unkeyed-table semantics (≙ kafka/bottledwater.c:537–540 + the unkeyed
    * matrix of spec/functional/message_spec.rb:99–163): inserts/updates of
    * unkeyed tables pass through (produced unkeyed), but deletes are DROPPED —
    * with no key there is nothing for compaction to tombstone.
    */
  def dropUnkeyedDeletes(envelopes: Dataset[CdcEvent]): Dataset[CdcEvent] =
    envelopes.filter(e => !(e.op == Op.Delete && e.key == null))

  /** Stream–static AS-OF enrichment: each streaming envelope row is joined
    * with a static dimension CHANGELOG's state as of the row's own LSN — the
    * point-in-time lookup consumers of the reference build on compacted
    * topics (README.md:288–297), where "latest" is wrong for rows that
    * committed before the dimension's latest change.
    *
    * Plan shape (works in streaming because the window runs on the STATIC
    * side only): the dimension changelog is interval-ized once — each version
    * gets `[_valid_from, _valid_to)` from a lead() over its own history —
    * then the stream equi-joins on key with a range predicate, matching
    * EXACTLY ONE version per stream row. No streaming aggregation, no state
    * store, no per-row window on the stream: at scale this is a plain
    * shuffled (or broadcast, for small dims) join.
    *
    * Dimension tombstones carry `after = null`, so a stream row landing in a
    * deleted interval enriches with null payload — deleted-as-of, preserved
    * rather than silently matched to an older version. Stream rows older
    * than the dimension's first version left-join to null.
    */
  def enrichAsOf(stream: Dataset[CdcEvent], dimChangelog: DataFrame,
      payloadCol: String = "after"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("lsn"), col("seq"))
    // cache makes "interval-ized once" literally true: without it the
    // stream–static join re-runs the dim scan + window shuffle every
    // micro-batch. MEMORY_AND_DISK (the Dataset default) for the stream's
    // lifetime; spills rather than OOMs on a large dimension.
    val intervals = dimChangelog
      .select(col("key").as("_dim_key"), col(payloadCol).as("dim_payload"),
        col("lsn").as("_valid_from"),
        lead(col("lsn"), 1).over(w).as("_valid_to"))
      .cache()
    stream.toDF()
      .join(intervals,
        col("key") === col("_dim_key") &&
          col("lsn") >= col("_valid_from") &&
          (col("_valid_to").isNull || col("lsn") < col("_valid_to")),
        "left")
      .withColumn("dim_asof_lsn", col("_valid_from"))
      .drop("_dim_key", "_valid_from", "_valid_to")
  }

  /** Debug sink (≙ the bwtest stdout consumer, client/bwtest.c:96–207). */
  def debugSink(envelopes: Dataset[CdcEvent]): DataStreamWriter[CdcEvent] =
    envelopes.writeStream.format("console")
      .outputMode(OutputMode.Append())
      .option("truncate", "false")

  /** Streaming windowed aggregation with watermarking over an event-time
    * column — the §2b streaming-extension surface (tumbling window + late
    * data bound). Generic: any envelope-derived frame with an event-time col.
    */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("table"), col("op"))
      .agg(count(lit(1)).as("n"))
}
