package graft.streaming

import graft.SparkTestSession
import graft.cdc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conf-matrix twin of the stateful streaming paths on the RocksDB state
  * store provider (bundled with Spark 4) — the 100 TB configuration.
  *
  * Why this matters at scale: the default HDFS-backed provider keeps every
  * key's state as JVM-heap objects — at CDC key cardinalities (the
  * reference caps its in-flight transaction list precisely because state
  * is memory, kafka/bottledwater.c:48–51) a 1000-executor run holds
  * billions of keys and the heap provider OOMs or GC-thrashes. RocksDB
  * keeps state off-heap and spills to local disk, bounding the heap by
  * block-cache size instead of key count. The library's stateful operators
  * (flatMapGroupsWithState compaction/LOCF, dropDuplicates, windowed aggs)
  * must therefore produce IDENTICAL output under both providers — these
  * tests pin that, and that the provider actually engaged (rocksdb custom
  * metrics present in the query progress), on the same pipelines the
  * cdc16/cdc19 gates run.
  */
class RocksDBStateStoreSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** A session whose streaming queries run their state through RocksDB;
    * isolated via newSession so the provider never leaks into sibling
    * suites running on the shared test session.
    */
  private def rocksSession() = {
    val s = base.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", rocksProvider)
    s
  }

  /** Run a streaming frame to completion on `s` and return (rows, rocksdb
    * custom-metric keys seen in the last progress) — the metric assertion
    * is what proves the provider engaged rather than silently defaulting.
    */
  private def drive(s: org.apache.spark.sql.SparkSession,
      streaming: org.apache.spark.sql.DataFrame, name: String,
      outputMode: String): (Seq[String], Set[String]) = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"rocks_$name").toString
    val q = streaming.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val metricKeys = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().asScala)
      .toSet
    (s.table(name).collect().map(_.toString).sorted.toSeq, metricKeys)
  }

  test("cdc19 pipeline (streamingForwardFill) on RocksDB ≡ q47 window twin") {
    val s = rocksSession()
    import s.implicits._
    val sf = "/root/testdata/sf0.001"
    val env = ChangelogGen.projectEvents(
      StreamStreamJoin.eventsStream(s, s"$sf/events.parquet"))
    val filled = LatestState.streamingForwardFill(env, _.op == Op.Update)
    val (streamed, metrics) = drive(s, filled.toDF()
      .select($"key", $"lsn", $"stateLsn"), "rocks_cdc19", "append")
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"state must run through RocksDB, saw metrics: $metrics")

    // the cdc19 oracle restated in Spark: LOCF window over the same changelog
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"key").orderBy($"lsn", $"seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = ChangelogGen.fromEvents(s, sf).toDF()
      .select($"key", $"lsn",
        last(when($"op" === Op.Update, $"lsn"), ignoreNulls = true).over(w)
          .as("stateLsn"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("forward fill carries state across micro-batches and silences replays") {
    val s = rocksSession()
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(key: String, lsn: Long, op: String, after: String): CdcEvent =
      CdcEvent(op, "t", lsn, lsn, 0, key, null, after)
    val events = Seq(
      ev("k1", 1, "insert", "a0"), ev("k1", 2, "update", "s1"),
      ev("k2", 3, "insert", "b0"), ev("k1", 4, "insert", "a1"),
      ev("k2", 5, "update", "s2"), ev("k1", 6, "update", "s3"))
    val input = MemoryStream[CdcEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("rocks_ff").toString
    val q = LatestState.streamingForwardFill(input.toDS(), _.op == "update")
      .writeStream.format("memory").queryName("rocks_ff")
      .outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val (b1, b2) = events.splitAt(3) // bearer s1 must cross the split
      input.addData(b1); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable() // at-least-once replay
      input.addData(b2); q.processAllAvailable()
      val got = s.table("rocks_ff")
        .select($"key", $"lsn", $"stateLsn", $"statePayload")
        .as[(String, Long, Option[Long], String)].collect().toSeq.sorted
      val expected = Seq(
        ("k1", 1L, None, null), ("k1", 2L, Some(2L), "s1"),
        ("k1", 4L, Some(2L), "s1"), ("k1", 6L, Some(6L), "s3"),
        ("k2", 3L, None, null), ("k2", 5L, Some(5L), "s2"))
      assert(got == expected.sorted)
    } finally q.stop()
  }

  test("streaming compaction (cdc16 family) on RocksDB ≡ batch compaction") {
    val s = rocksSession()
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(op: String, key: String, lsn: Long, after: String): CdcEvent =
      CdcEvent(op, "public.users", lsn, lsn / 10, 0, key, null, after)
    val all = Seq(
      ev("insert", "1", 1, "v1"), ev("update", "1", 5, "v2"),
      ev("insert", "2", 2, "w1"), ev("delete", "2", 6, null),
      ev("insert", "3", 3, "x1"), ev("update", "3", 4, "x2"))
    val input = MemoryStream[CdcEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("rocks_cmp").toString
    val q = LatestState.streaming(input.toDS())
      .writeStream.format("memory").queryName("rocks_cmp")
      .outputMode(LatestState.streamingOutputMode)
      .option("checkpointLocation", ckpt).start()
    try {
      val (b1, b2) = all.splitAt(3)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // memory sink in update mode appends updated rows; latest per key wins.
      // The stream EMITS the tombstone (sinks act on it); batch state drops
      // tombstoned keys by default — compare with keepDeleted=true.
      val got = s.table("rocks_cmp")
        .groupBy($"key").agg(max_by(struct($"lsn", $"op", $"after"), $"lsn").as("s"))
        .select($"key", $"s.op", $"s.after")
        .as[(String, String, String)].collect().map { case (k, o, a) => k -> ((o, a)) }.toMap
      val batch = LatestState.batch(all.toDF(), Seq("table", "key"), Seq("lsn", "seq"),
          keepDeleted = true)
        .select($"key", $"op", $"after")
        .as[(String, String, String)].collect().map { case (k, o, a) => k -> ((o, a)) }.toMap
      assert(got == batch)
      assert(got("2")._1 == "delete") // tombstone emitted by the stream
    } finally q.stop()
  }

  test("session windows (cdc20 family) merge session state on RocksDB") {
    val s = rocksSession()
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window($"ts", "5 minutes").as("sw"), $"user")
      .agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("rocks_sess").toString
    val q = df.writeStream.format("memory").queryName("rocks_sess")
      .outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    try {
      val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      // events arrive across batches; the 3rd bridges the first two into ONE
      // session (the merge is what exercises the session-store format)
      input.addData((t(1), 7L, 1.0), (t(9), 7L, 1.0))
      q.processAllAvailable()
      input.addData((t(5), 7L, 1.0)) // bridges 1 and 9 (gaps now < 5 min)
      q.processAllAvailable()
      val got = s.table("rocks_sess")
        .select(unix_micros($"sw.start"), unix_micros($"sw.end"), $"user", $"n")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
        .getTime * 1000L
      assert(got == Set((us(1), us(14), 7L, 3L)),
        s"three events must merge into one session [1, 9+5): $got")
    } finally q.stop()
  }

  test("session state survives a checkpoint restart (stop mid-stream, resume)") {
    // the restore path no other stateful test exercises: an OPEN session
    // checkpointed by run 1 must merge with run 2's events after restart
    val s = rocksSession()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sess_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ckpt").toString
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def write(name: String, rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "user").coalesce(1).write.parquet(s"$dir/$name")
    // file 1: two events of one session; file 2 (present only for run 2):
    // a third event extending it + a separate later session
    write("f1", Seq((t(1), 7L), (t(3), 7L)))
    def run(): Unit = {
      val q = s.readStream
        .schema("ts timestamp, user bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/*")
        .withWatermark("ts", "1 minute")
        .groupBy(session_window($"ts", "5 minutes").as("sw"), $"user")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("sess_restart")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // run 1 checkpoints the open [1, 3+5) session and stops
    write("f2", Seq((t(6), 7L), (t(30), 7L)))
    run() // run 2 must resume from state, not recompute from scratch
    val got = s.table("sess_restart")
      .select(unix_micros($"sw.start"), unix_micros($"sw.end"), $"user", $"n")
      .as[(Long, Long, Long, Long)].collect().toSet
    def us(m: Int) = t(m).getTime * 1000L
    assert(got == Set((us(1), us(11), 7L, 3L), (us(30), us(35), 7L, 1L)),
      s"restored session must merge with post-restart events: $got")
  }

  test("built-in stateful ops (dropDuplicates + windowed agg) on RocksDB") {
    val s = rocksSession()
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "lsn", "key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("lsn", "key")
      .groupBy(window($"ts", "10 minutes"), $"key")
      .agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("rocks_win").toString
    val q = df.writeStream.format("memory").queryName("rocks_win")
      .outputMode("update")
      .option("checkpointLocation", ckpt).start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
      input.addData((t, 1L, "a"), (t, 1L, "a"), (t, 2L, "a"), (t, 3L, "b"))
      q.processAllAvailable()
      input.addData((t, 1L, "a")) // cross-batch redelivery
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val metricKeys = q.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.keySet().asScala).toSet
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb metrics, saw: $metricKeys")
      val got = s.table("rocks_win").select($"key", $"n")
        .as[(String, Long)].collect().groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).max }
      assert(got == Map("a" -> 2L, "b" -> 1L)) // dups suppressed across batches
    } finally q.stop()
  }

  test("stream-stream AS-OF join (cdc42 pipeline) on RocksDB ≡ batch argmax") {
    // the cdc42 shape — interval left-outer join chained into a windowed
    // argmax, TWO stateful operators sharing one RocksDB-backed query —
    // must produce the identical result the default provider's gate pins
    val s = rocksSession()
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val ev = StreamStreamJoin.eventsStreamWithSentinel(s,
      s"$d/events.parquet", Seq("purchase", "view"))
    val sp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val su = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("u_id"),
        col("value").as("u_value"), col("ts").as("u_ts"))
    val joined = StreamStreamJoin.asOfJoin(sp, su, "user_id", "p_ts", "u_ts",
      "24 HOURS", "0 seconds", rightCols = Seq("u_id", "u_value"))
    // sentinel filter must run AFTER materialization: pre-sink it would be
    // pushed below the watermark node and the sentinel could never advance
    // the watermark (the gates filter the memory table for the same reason)
    val (streamedAll, metrics) = drive(s,
      joined.select($"user_id", $"p_id", $"u_id", $"u_value"),
      "rocks_asof", "append")
    val streamed = streamedAll.filterNot(_.startsWith("[-1,"))
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"state must run through RocksDB, saw metrics: $metrics")

    import org.apache.spark.sql.expressions.Window
    val bev = graft.Tables.events(s, d)
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
      .select($"user_id", $"p_id", $"u_id", $"u_value")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
