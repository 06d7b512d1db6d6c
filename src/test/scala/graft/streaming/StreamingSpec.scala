package graft.streaming

import graft.SparkTestSession
import graft.cdc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AvroFrameSpec extends AnyFunSuite {
  private val events = Seq(
    CdcEvent("insert", "public.users", 0, 5, 0, """{"id":1}""", null, """{"id":1,"u":"ada"}"""),
    CdcEvent("update", "public.users", 0, 5, 1, """{"id":1}""", """{"id":1,"u":"ada"}""",
      """{"id":1,"u":"ada2"}"""),
    CdcEvent("delete", "public.users", 0, 5, 2, """{"id":1}""", null, null))

  test("binary frame roundtrip: begin/commit bracket, lsn stamping, tombstones") {
    val bytes = AvroFrame.encodeTxn(xid = 5, lsn = 777, events)
    val relid = AvroFrame.relidOf("public.users")
    val (xid, lsn, decoded) = AvroFrame.decodeFrame(bytes, Map(relid -> "public.users"))
    assert(xid == 5 && lsn == 777)
    assert(decoded.map(_.op) == Seq("insert", "update", "delete"))
    assert(decoded.forall(_.lsn == 777))        // commit LSN stamps all events
    assert(decoded.last.after == null)          // tombstone survives the wire
    assert(decoded(1).before.contains("ada"))
    assert(decoded.map(_.seq) == Seq(0L, 1L, 2L))
  }

  test("trailing bytes are rejected (strict parse_frame behavior)") {
    val bytes = AvroFrame.encodeTxn(5, 777, events) ++ Array[Byte](1, 2)
    intercept[IllegalArgumentException] {
      AvroFrame.decodeFrame(bytes, _ => "t")
    }
  }

  test("TableSchema retargets a relid mid-stream (rename + column-add churn)") {
    import org.apache.spark.sql.types._
    // A Postgres OID is stable across ALTER TABLE ... RENAME (the scenario of
    // spec/functional/topic_spec.rb:16–274): pin one relid for both names.
    val relid = 424242L
    val stable = (_: String) => relid
    val s1 = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val s2 = StructType(Seq(StructField("id", LongType), StructField("sku", StringType)))
    val txn1 = AvroFrame.encodeTxn(1, 100, Seq(
      SchemaCache.schemaMessage(relid, "public.widgets", s1),
      CdcEvent(Op.Insert, "public.widgets", 0, 1, 1, """{"id":1}""", null,
        """{"id":1,"name":"w"}""")), stable)
    val txn2 = AvroFrame.encodeTxn(2, 200, Seq(
      SchemaCache.schemaMessage(relid, "public.gadgets", s2),
      CdcEvent(Op.Update, "public.gadgets", 0, 2, 1, """{"id":1}""", null,
        """{"id":1,"sku":"x"}""")), stable)

    val state = new AvroFrame.DecoderSchemaState()
    val (_, _, ev1) = AvroFrame.decodeFrame(txn1, state)
    assert(ev1.map(_.op) == Seq(Op.Schema, Op.Insert))
    assert(ev1(1).table == "public.widgets")
    assert(state.tableOf(relid) == "public.widgets")
    assert(DataType.fromJson(state.schemaJsonOf(relid).get) == s1)

    val (_, _, ev2) = AvroFrame.decodeFrame(txn2, state)
    assert(ev2.map(_.op) == Seq(Op.Schema, Op.Update))
    assert(ev2(1).table == "public.gadgets")     // post-rename identity
    assert(ev1(1).table == "public.widgets")     // pre-rename events untouched
    assert(state.tableOf(relid) == "public.gadgets")
    assert(DataType.fromJson(state.schemaJsonOf(relid).get) == s2)

    // a relid never announced fails loudly when there is no fallback
    intercept[NoSuchElementException] { state.tableOf(999L) }
  }

  test("avro-json output is union-tagged (kafka/json.c semantics)") {
    val json = AvroFrame.encodeTxnJson(5, 777, events.take(1))
    assert(json.contains("\"graft.cdc.BeginTxn\""))   // union branch tags
    assert(json.contains("\"graft.cdc.Insert\""))
    assert(json.contains("\"bytes\""))                // nullable-bytes union tag
  }
}

class CdcPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ev(op: String, key: String, lsn: Long, after: String): CdcEvent =
    CdcEvent(op, "public.users", lsn, lsn / 10, 0, key, null, after)

  test("snapshot ∪ stream end-to-end: guard → split → compact → per-table sink") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // "database state" at snapshot time
    val base = Seq((1L, "ada"), (2L, "bob")).toDF("id", "u")
    val snapshot = CdcPipeline.snapshotEnvelopes(base, "public.users", Seq("id"))

    // streaming union of a batch DF is not allowed → snapshot rides as the
    // first micro-batch instead (same lifecycle, SURVEY §3.1)
    val inputWithSnapshot = MemoryStream[CdcEvent]
    inputWithSnapshot.addData(snapshot.collect().toSeq)

    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = CdcPipeline.writeLatestState(
      CdcPipeline.latestStateStream(inputWithSnapshot.toDS()), out, ckpt).start()
    q.awaitTermination()

    // live changes after the snapshot
    inputWithSnapshot.addData(
      ev("update", """{"id":1}""", 10, """{"id":1,"u":"ada2"}"""),
      ev("delete", """{"id":2}""", 11, null),
      ev("insert", """{"id":3}""", 12, """{"id":3,"u":"cyn"}"""))
    val q2 = CdcPipeline.writeLatestState(
      CdcPipeline.latestStateStream(inputWithSnapshot.toDS()), out, ckpt).start()
    q2.awaitTermination()

    // sink MERGEs into per-table state dirs ('.' escapes to _2e_, so
    // public.users can't collide with a table literally named public_users)
    val state = graft.cdc.MaterializedTable
      .read(spark, s"$out/public_2e_users")
      .select("key", "after").as[(String, String)].collect().toMap
    assert(state.keySet == Set("""{"id":1}""", """{"id":3}"""))
    assert(state("""{"id":1}""").contains("ada2"))
    // the sink records lsn stats by default: the table's replication
    // high-water is a METADATA-ONLY read (no data files opened)
    val sm = graft.cdc.MaterializedTable
      .statsSummary(spark, s"$out/public_2e_users").collect()(0)
    assert(sm.getAs[Long]("rows") == 2 && sm.getAs[Long]("max_lsn") == 12L)
  }

  test("cross-batch relid collision fails the sink, not silently misroutes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // 'Aa' and 'BB' share a hashCode (the classic collision pair). They
    // arrive in DIFFERENT micro-batches — a batch-local check would pass
    // each individually; the writer's cumulative table set must not.
    val out = java.nio.file.Files.createTempDirectory("graft_relid_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_relid_ckpt").toString
    val input = MemoryStream[CdcEvent]
    // ONE writer instance = one cumulative set across its (AvailableNow) runs
    val writer = CdcPipeline.writeLatestState(
      CdcPipeline.latestStateStream(input.toDS()), out, ckpt)
    input.addData(CdcEvent(Op.Insert, "Aa", 1, 0, 0, "k1", null, """{"v":1}"""))
    writer.start().awaitTermination()
    input.addData(CdcEvent(Op.Insert, "BB", 2, 0, 0, "k2", null, """{"v":2}"""))
    val q2 = writer.start()
    val e = intercept[Exception] { q2.awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("relid collision")),
      s"expected a relid-collision failure, got: ${messages(e)}")
  }

  test("backpressure: maxFilesPerTrigger paces a file source batch-by-batch") {
    import spark.implicits._
    // two parquet files → with maxFilesPerTrigger=1 the file source must
    // split the backlog into (at least) two micro-batches — the reference's
    // hand-built rate control (SURVEY §2a row 21) as engine config
    val src = java.nio.file.Files.createTempDirectory("bp_src").toString
    Seq(ev("insert", """{"id":1}""", 1, """{"id":1,"u":"a"}""")).toDS()
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(ev("insert", """{"id":2}""", 2, """{"id":2,"u":"b"}""")).toDS()
      .coalesce(1).write.parquet(s"$src/f2")
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CdcEvent]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.add(b.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    assert(sizes.sum == 2, s"all rows must arrive: $sizes")
    assert(sizes.count(_ > 0) >= 2, s"backlog must be split across batches: $sizes")
  }

  test("debug sink composes the console writer (bwtest stdout analog)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = CdcPipeline.debugSink(input.toDS()).start()
    try {
      input.addData(ev("insert", """{"id":1}""", 1, """{"id":1,"u":"a"}"""))
      q.processAllAvailable()            // console sink prints; must not fail
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("skip-snapshot mode ignores existing contents, emits only live changes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // prepopulated "database state" (snapshot_spec.rb:12–15) that streamOnly
    // must NEVER emit — it is simply not wired into the plan
    val base = Seq((1L, "user1"), (2L, "user2")).toDF("id", "u")
    assert(base.count() == 2) // exists, and is ignored below

    val input = MemoryStream[CdcEvent]
    val q = CdcPipeline.streamOnly(input.toDS())
      .writeStream.format("memory").queryName("skip_snapshot")
      .outputMode(LatestState.streamingOutputMode).start()
    try {
      input.addData(
        ev("insert", """{"id":11}""", 20, """{"id":11,"u":"user11"}"""),
        ev("update", """{"id":11}""", 21, """{"id":11,"u":"user11b"}"""))
      q.processAllAvailable()
      val keys = spark.table("skip_snapshot").select("key", "after")
        .as[(String, String)].collect().toMap
      // only the live change is visible (snapshot_spec.rb:52–61); the
      // prepopulated rows (ids 1, 2) never appear
      assert(keys.keySet == Set("""{"id":11}"""))
      assert(keys("""{"id":11}""").contains("user11b"))
    } finally q.stop()
  }

  test("stream–static as-of enrichment: rows see dim state at their own LSN") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // dimension changelog for key "1": v1 at lsn 10, v2 at lsn 20,
    // tombstone at lsn 30 (after = null)
    val dim = Seq(
      ev("insert", "1", 10, "v1"),
      ev("update", "1", 20, "v2"),
      ev("delete", "1", 30, null)).toDF()
      .select("key", "lsn", "seq", "after")
    val input = MemoryStream[CdcEvent]
    val q = CdcPipeline.enrichAsOf(input.toDS(), dim)
      .select("key", "lsn", "dim_payload", "dim_asof_lsn")
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      input.addData(
        ev("insert", "1", 5, "x"),    // before any dim state → null
        ev("insert", "1", 15, "x"),   // sees v1
        ev("insert", "1", 25, "x"),   // sees v2
        ev("insert", "1", 35, "x"),   // deleted-as-of → null payload, lsn 30
        ev("insert", "2", 15, "x"))   // key with no dim history → null
      q.processAllAvailable()
      val rows = spark.table("asof_enrich")
        .as[(String, Long, Option[String], Option[Long])].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(rows(("1", 5L)) == ((None, None)))
      assert(rows(("1", 15L)) == ((Some("v1"), Some(10L))))
      assert(rows(("1", 25L)) == ((Some("v2"), Some(20L))))
      assert(rows(("1", 35L)) == ((None, Some(30L)))) // tombstone interval
      assert(rows(("2", 15L)) == ((None, None)))
    } finally q.stop()
  }

  test("session windows over the event stream (gap-based grouping)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      val t = (m: Int, s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
      // one session of 3 events (gaps < 5 min), then a 20-minute gap
      input.addData((t(1, 0), 7L), (t(3, 0), 7L), (t(6, 0), 7L))
      input.addData((t(26, 0), 7L))   // new session; watermark closes the first
      q.processAllAvailable()
      input.addData((t(59, 0), 7L))   // push watermark further
      q.processAllAvailable()
      val rows = spark.table("sesswin").select("user", "n")
        .as[(Long, Long)].collect().toSeq
      assert(rows.contains((7L, 3L)), s"first session should emit 3 events: $rows")
    } finally q.stop()
  }

  test("streaming at-least-once dedup: dropDuplicates within watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "lsn", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("lsn", "key")   // redelivery id = (lsn, key)
    val q = df.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
      input.addData((t, 1L, "a"), (t, 1L, "a"), (t, 2L, "b"))  // dup in batch
      q.processAllAvailable()
      input.addData((t, 1L, "a"))                               // redelivery later
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)          // exactly-once
    } finally q.stop()
  }

  test("stream–stream join with watermarks (declared §2b extension)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "cuser").withWatermark("cts", "10 minutes")
    val b = buys.toDF().toDF("bts", "buser").withWatermark("bts", "10 minutes")
    val joined = c.join(b,
      expr("cuser = buser AND bts BETWEEN cts AND cts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      clicks.addData((t(1), 7L), (t(1), 8L))
      buys.addData((t(3), 7L))   // within 5 min of user 7's click
      buys.addData((t(9), 8L))   // outside the interval for user 8
      q.processAllAvailable()
      val rows = spark.table("ssjoin").select("cuser").as[Long].collect().toSeq
      assert(rows == Seq(7L))
    } finally q.stop()
  }

  test("stream–static enrichment join (dimension broadcast into a stream)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val enriched = input.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      input.addData((7L, 1.0), (9L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("enrich").select("user_id", "tier")
        .as[(Long, String)].collect().toMap
      assert(rows(7L) == "gold" && rows(9L) == null)
    } finally q.stop()
  }

  test("stream-stream interval join holds state across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ssjoin").toString
    // purchases and clicks land in DIFFERENT files; with maxFilesPerTrigger=1
    // every joined pair must cross a micro-batch boundary — the join only
    // works if one side is retained in the state store until the other
    // side's batch arrives
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("purchase", "click"))
      .repartition(2, col("event_type"))
      .write.mode("overwrite").parquet(dir)
    val static = spark.read.parquet(dir)
    val stream = spark.readStream.schema(static.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts")))
    val (sp, sc) = sides(stream)
    val streamed = StreamStreamJoin.runToMemory(spark,
        StreamStreamJoin.intervalJoin(sp, sc, "user_id", "p_ts", "c_ts",
          "24 HOURS", "0 seconds"),
        s"ssj_${java.util.UUID.randomUUID().toString.take(8)}")
      .select("user_id", "p_id", "c_id")
    val (bp, bc) = sides(static)
    val batch = bp.join(bc.withColumnRenamed("user_id", "cu"),
        col("user_id") === col("cu") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("c_ts") <= col("p_ts"))
      .select("user_id", "p_id", "c_id")
    assert(batch.count() > 0, "fixture produced no joinable pairs")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER join: unmatched rows emit nulls once proven") {
    val d = "/root/testdata/sf0.001"
    val ev = StreamStreamJoin.eventsStreamWithSentinel(spark,
      s"$d/events.parquet", Seq("purchase", "click"))
    val sp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val sc = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val streamed = StreamStreamJoin.runToMemory(spark,
        StreamStreamJoin.intervalJoinLeftOuter(sp, sc, "user_id",
          "p_ts", "c_ts", "24 HOURS", "0 seconds"),
        s"ssjo_${java.util.UUID.randomUUID().toString.take(8)}")
      .filter(col("user_id") >= 0)
      .select("user_id", "p_id", "c_id")
    val bev = graft.Tables.events(spark, d)
    val bp = bev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val bc = bev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    val batch = bp.join(bc,
        col("user_id") === col("cu") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("c_ts") <= col("p_ts"), "left_outer")
      .select("user_id", "p_id", "c_id")
    // the outer rows are the point: some purchases have no click in window
    assert(batch.filter(col("c_id").isNull).count() > 0,
      "fixture produced no unmatched purchases")
    assert(streamed.filter(col("c_id").isNull).count() ==
      batch.filter(col("c_id").isNull).count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("windowed aggregation with watermark over the envelope stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "table", "op")
    val q = CdcPipeline.windowedCounts(df, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:02:00")
      val late = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
      input.addData((t0, "t", "insert"), (t1, "t", "insert"))
      q.processAllAvailable()
      input.addData((late, "t", "insert")) // advances watermark past window 0
      q.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 01:30:00"), "t", "update"))
      q.processAllAvailable()
      val rows = spark.table("winagg").select("table", "op", "n")
        .as[(String, String, Long)].collect()
      assert(rows.contains(("t", "insert", 2L))) // first window emitted on close
    } finally q.stop()
  }

  test("streamingForwardFill ≡ batch LOCF window; whole-batch replays are silent") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(key: String, lsn: Long, op: String, after: String): CdcEvent =
      CdcEvent(op, "t", lsn, lsn, 0, key, null, after)
    // two keys; 'update' bears state, other ops are enriched passengers;
    // k2 sees events BEFORE its first bearer (must fill null, not fail)
    val events = Seq(
      ev("k1", 1, "insert", "a0"), ev("k1", 2, "update", "s1"),
      ev("k2", 3, "insert", "b0"), ev("k1", 4, "insert", "a1"),
      ev("k2", 5, "update", "s2"), ev("k1", 6, "update", "s3"),
      ev("k2", 7, "insert", "b1"), ev("k1", 8, "insert", "a2"))

    val input = MemoryStream[CdcEvent]
    val q = LatestState.streamingForwardFill(input.toDS(), _.op == "update")
      .writeStream.format("memory").queryName("locf")
      .outputMode("append").start()
    try {
      val (b1, b2) = events.splitAt(4) // bearer s1 must carry across the split
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b1) // at-least-once: full replay of batch 1 — silence
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("locf")
        .select($"key", $"lsn", $"stateLsn", $"statePayload")
        .as[(String, Long, Option[Long], String)].collect().toSeq.sorted

      // batch twin: the q47 formulation over the same events
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"key").orderBy($"lsn", $"seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val batch = events.toDF()
        .select($"key", $"lsn",
          last(when($"op" === "update", $"lsn"), ignoreNulls = true).over(w)
            .as("stateLsn"),
          last(when($"op" === "update", $"after"), ignoreNulls = true).over(w)
            .as("statePayload"))
        .as[(String, Long, Option[Long], String)].collect().toSeq.sorted
      assert(streamed == batch)
      assert(streamed.size == events.size, "replay must not duplicate rows")
      // pre-bearer events filled with null state
      assert(streamed.exists { case (k, _, st, _) => k == "k2" && st.isEmpty })
    } finally q.stop()
  }

  test("events loaders do not leak nanosAsLong on non-nanos data") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    val d = "/root/testdata/sf0.001"
    try {
      spark.conf.unset(key)
      // unset leaves the key at its DEFAULT ("false"); the contract under
      // test is that the loaders leave the observable value unchanged for
      // non-nanos data (and set "true" exactly when the data IS nanos)
      val baseline = spark.conf.getOption(key)
      graft.Tables.events(spark, d)
      val isNanos = spark.conf.getOption(key).contains("true")
      if (isNanos) {
        // nanos-encoded generation: the conf MUST stay set — every later
        // job re-resolves it at read time
        assert(spark.conf.get(key) == "true")
      } else {
        assert(spark.conf.getOption(key) == baseline,
          "Tables.events must restore the session conf for non-nanos data")
        StreamStreamJoin.eventsStream(spark, s"$d/events.parquet")
        assert(spark.conf.getOption(key) == baseline,
          "eventsStream must restore the session conf for non-nanos data")
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("stream-stream AS-OF join ≡ batch argmax, across micro-batches") {
    val d = "/root/testdata/sf0.001"
    val ev = StreamStreamJoin.eventsStreamWithSentinel(spark,
      s"$d/events.parquet", Seq("purchase", "view"))
    val sp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val su = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("u_id"),
        col("value").as("u_value"), col("ts").as("u_ts"))
    val streamed = StreamStreamJoin.runToMemory(spark,
        StreamStreamJoin.asOfJoin(sp, su, "user_id", "p_ts", "u_ts",
          "24 HOURS", "0 seconds", rightCols = Seq("u_id", "u_value")),
        s"asof_${java.util.UUID.randomUUID().toString.take(8)}")
      .filter(col("user_id") >= 0)
      .select("user_id", "p_id", "u_id", "u_value")

    // batch twin: candidates in window, row_number argmax by (ts, id) DESC
    import org.apache.spark.sql.expressions.Window
    val bev = graft.Tables.events(spark, d)
    val bp = bev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val bu = bev.filter(col("event_type") === "view")
      .select(col("user_id").as("uu"), col("event_id").as("u_id"),
        col("value").as("u_value"), col("ts").as("u_ts"))
    val batch = bp.join(bu,
        col("user_id") === col("uu") &&
          col("u_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
          col("u_ts") <= col("p_ts"), "left_outer")
      .withColumn("rn", row_number().over(Window.partitionBy(col("p_id"))
        .orderBy(col("u_ts").desc_nulls_last, col("u_id").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("user_id", "p_id", "u_id", "u_value")
    // one row per purchase; both matched and unmatched classes present
    assert(batch.filter(col("u_id").isNull).count() > 0 &&
      batch.filter(col("u_id").isNotNull).count() > 0,
      "fixture must exercise both matched and match-less purchases")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream AS-OF join: deterministic tie-break and window pick") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val left = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val right = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val l = left.toDF().toDF("p_ts", "user_id", "p_id")
    val r = right.toDF().toDF("u_ts", "user_id", "u_id", "u_value")
    val joined = StreamStreamJoin.asOfJoin(l, r, "user_id", "p_ts", "u_ts",
      "1 HOUR", "0 seconds", rightCols = Seq("u_id", "u_value"),
      windowSize = "1 hour")
    val q = joined.writeStream.format("memory").queryName("asof_tie")
      .outputMode("append").start()
    try {
      // user 1: two updates at the SAME ts → winner must be the greater id;
      // user 2: newest-not-newer-than wins over an older one;
      // user 3: only a LATER update exists → null enrichment
      right.addData((t(5), 1L, 100L, 1.0), (t(5), 1L, 101L, 2.0),
        (t(3), 2L, 200L, 3.0), (t(8), 2L, 201L, 4.0),
        (t(30), 3L, 300L, 5.0))
      left.addData((t(10), 1L, 1000L), (t(10), 2L, 2000L), (t(10), 3L, 3000L))
      q.processAllAvailable()
      // sentinels in a LATER batch, far past the argmax window end (01:00),
      // push the watermark over both stateful operators' frontiers
      val far = java.sql.Timestamp.valueOf("2024-01-01 03:00:00")
      left.addData((far, -1L, -1L))
      right.addData((far, -1L, -1L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("asof_tie").filter($"user_id" >= 0)
        .select($"p_id", $"u_id", $"u_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map { case (p, u, v) => p -> ((u, v)) }.toMap
      assert(rows(1000L) == ((Some(101L), Some(2.0))),
        s"same-ts tie must break to greater id, got ${rows.get(1000L)}")
      assert(rows(2000L) == ((Some(201L), Some(4.0))))
      assert(rows(3000L) == ((None, None)),
        "a later-only update must not enrich (as-of looks backward)")
    } finally q.stop()
  }
}
