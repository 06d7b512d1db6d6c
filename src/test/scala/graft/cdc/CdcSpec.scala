package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC-semantics suite — ports the behavioral matrix of
  * spec/functional/message_spec.rb:31–163 (insert/update/delete visibility,
  * tombstones, replay) onto the engine's operators.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ev(op: String, key: String, lsn: Long, after: String,
      seq: Long = 0, table: String = "public.users"): CdcEvent =
    CdcEvent(op, table, lsn, lsn / 10, seq, key, null, after)

  // Scripted changelog mirroring message_spec.rb:20–21 users(id pk, username).
  private val script = Seq(
    ev(Op.Insert, "1", 1, """{"id":1,"username":"ada"}"""),
    ev(Op.Insert, "2", 2, """{"id":2,"username":"bob"}"""),
    ev(Op.Update, "1", 3, """{"id":1,"username":"ada2"}"""),
    ev(Op.Insert, "3", 4, """{"id":3,"username":"cyn"}"""),
    ev(Op.Delete, "2", 5, null),
    ev(Op.Update, "3", 6, """{"id":3,"username":"cyn2"}"""))

  test("batch compaction: last write wins, tombstones drop keys") {
    import spark.implicits._
    val out = LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
      .select("key", "lsn", "after").as[(String, Long, String)].collect()
      .map { case (k, l, a) => k -> ((l, a)) }.toMap
    assert(out.keySet == Set("1", "3"))          // key 2 tombstoned
    assert(out("1") == (3L, """{"id":1,"username":"ada2"}"""))
    assert(out("3") == (6L, """{"id":3,"username":"cyn2"}"""))
  }

  test("batch compaction keepDeleted surfaces tombstones") {
    import spark.implicits._
    val out = LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq"),
      keepDeleted = true)
    assert(out.count() == 3)
    assert(out.filter(col("op") === Op.Delete).select("key")
      .as[String].collect().toSeq == Seq("2"))
  }

  test("compaction is idempotent under at-least-once replay") {
    import spark.implicits._
    val once = LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
    val replayed = LatestState.batch(
      script.toDF().union(script.toDF()), Seq("table", "key"), Seq("lsn", "seq"))
    assert(once.orderBy("key").collect().toSeq ==
      replayed.orderBy("key").collect().toSeq)
  }

  test("Aggregator-based compaction (UDAF surface) agrees with max_by batch") {
    import spark.implicits._
    val viaAggregator = script.toDS()
      .groupByKey(e => (e.table, e.key))
      .agg(LatestState.latestAggregator.toColumn)
      .map(_._2).filter(_.op != Op.Delete)
      .collect().sortBy(_.key).toSeq
    val viaMaxBy = LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
      .as[CdcEvent].collect().sortBy(_.key).toSeq
    assert(viaAggregator == viaMaxBy)
  }

  test("batchArgmax fast path ≡ batch; sort-free plan; loud fallback past key budget") {
    import spark.implicits._
    val ord = col("lsn") * 1048576L + col("seq")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[CdcEvent].collect().sortBy(_.key).toSeq
    val viaBatch = sorted(
      LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq")))
    val fast = LatestState.batchArgmax(script.toDF(), Seq("table", "key"), ord)
    assert(sorted(fast) == viaBatch)
    // the point of the path: a primitive-buffer HashAggregate + broadcast
    // join-back — no SortAggregate anywhere (batch()'s struct max_by
    // buffer forces one and sorts the full event volume per partition)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // keepDeleted + asOfLsn parity
    assert(sorted(LatestState.batchArgmax(script.toDF(), Seq("table", "key"),
        ord, keepDeleted = true)) ==
      sorted(LatestState.batch(script.toDF(), Seq("table", "key"),
        Seq("lsn", "seq"), keepDeleted = true)))
    assert(sorted(LatestState.batchArgmax(script.toDF(), Seq("table", "key"),
        ord, asOfLsn = Some(4L))) ==
      sorted(LatestState.batch(script.toDF(), Seq("table", "key"),
        Seq("lsn", "seq"), asOfLsn = Some(4L))))
    // past the key budget: identical results via the sort-path fallback
    spark.conf.set("spark.graft.latestState.argmaxMaxKeys", "1")
    try {
      val fb = LatestState.batchArgmax(script.toDF(), Seq("table", "key"), ord)
      assert(sorted(fb) == viaBatch)
      assert(!fb.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.unset("spark.graft.latestState.argmaxMaxKeys")
  }

  test("streaming compaction (flatMapGroupsWithState) agrees with batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = LatestState.streaming(input.toDS())
      .writeStream.format("memory").queryName("latest_stream")
      .outputMode(LatestState.streamingOutputMode).start()
    try {
      // Deliver in two micro-batches, splitting mid-key to exercise state.
      input.addData(script.take(3)); q.processAllAvailable()
      input.addData(script.drop(3)); q.processAllAvailable()
      val streamed = spark.table("latest_stream")
        .groupBy("key").agg(max_by(struct(col("*")), struct(col("lsn"), col("seq"))).as("s"))
        .select("s.key", "s.op", "s.lsn", "s.after")
        .as[(String, String, Long, String)].collect()
        .filter(_._2 != Op.Delete).map(t => (t._1, t._3, t._4)).sortBy(_._1)
      val batch = LatestState.batch(script.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
        .select("key", "lsn", "after").as[(String, Long, String)]
        .collect().sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming compaction ignores stale replays (exactly-once effect)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = LatestState.streaming(input.toDS())
      .writeStream.format("memory").queryName("latest_replay")
      .outputMode(LatestState.streamingOutputMode).start()
    try {
      input.addData(script); q.processAllAvailable()
      input.addData(script.take(3)); q.processAllAvailable() // stale redelivery
      val key1 = spark.table("latest_replay").filter(col("key") === "1")
        .select(max(col("lsn"))).as[Long].collect().head
      assert(key1 == 3L) // not regressed by the replayed lsn=3 max
    } finally q.stop()
  }

  test("tombstone TTL: timed-out tombstones evict silently; live keys survive") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // TTL must comfortably exceed worst-case batch latency on a loaded
    // machine: b2's events must land BEFORE b1's tombstone timers expire
    // for the within-TTL assertions to be meaningful.
    val ttlMs = 8000L
    val input = MemoryStream[CdcEvent]
    // ProcessingTimeTimeout makes the engine re-run micro-batches continuously
    // to poll for expired timers, so processAllAvailable never quiesces — pace
    // the loop with a real trigger and poll the sink instead.
    val q = LatestState.streaming(input.toDS(),
        tombstoneTtl = Some(java.time.Duration.ofMillis(ttlMs)))
      .writeStream.format("memory").queryName("latest_ttl")
      .outputMode(LatestState.streamingOutputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    def rows() = spark.table("latest_ttl")
      .select("key", "op", "lsn").as[(String, String, Long)].collect().toSeq
    def await(what: String)(p: Seq[(String, String, Long)] => Boolean) = {
      val deadline = System.nanoTime + 60L * 1000000000L
      var cur = rows()
      while (!p(cur) && System.nanoTime < deadline && q.exception.isEmpty) {
        Thread.sleep(100); cur = rows()
      }
      q.exception.foreach(throw _)
      assert(p(cur), s"'$what' not reached in 60s: $cur")
      cur
    }
    try {
      // b1: A and D end deleted (tombstone retained, TTL armed); C live.
      input.addData(Seq(
        ev(Op.Insert, "A", 1, """{"id":"A"}"""),
        ev(Op.Delete, "A", 3, null),
        ev(Op.Insert, "C", 5, """{"id":"C"}"""),
        ev(Op.Insert, "D", 7, """{"id":"D"}"""),
        ev(Op.Delete, "D", 8, null)))
      await("b1 compacted")(_.toSet ==
        Set(("A", Op.Delete, 3L), ("C", Op.Insert, 5L), ("D", Op.Delete, 8L)))

      // b2 (within TTL): a stale pre-delete replay for A is NOT resurrected —
      // the retained tombstone wins (and re-arms A's timer). C is deleted
      // (TTL armed). D is re-inserted: per GroupState semantics every
      // function call clears the previously-set timeout and we re-arm only
      // for deletes, so D's TTL is gone and its live state must survive the
      // eviction wait below.
      input.addData(Seq(
        ev(Op.Insert, "A", 2, """{"id":"A-stale"}"""),
        ev(Op.Delete, "C", 6, null),
        ev(Op.Insert, "D", 9, """{"id":"D2"}""")))
      val afterB2 = await("b2 compacted")(r =>
        r.count(_ == (("A", Op.Delete, 3L))) == 2 &&   // tombstone re-won
          r.contains(("C", Op.Delete, 6L)) && r.contains(("D", Op.Insert, 9L)))
      assert(!afterB2.contains(("A", Op.Insert, 2L)))  // no resurrection

      Thread.sleep(ttlMs + 6000)  // well past the A and C tombstone timers

      // b3: timed-out tombstones (A, C) evicted SILENTLY — the continuous
      // timer-polling batches emitted nothing; one new key adds exactly one row.
      input.addData(Seq(ev(Op.Insert, "B", 10, """{"id":"B"}""")))
      val afterB3 = await("b3 delivered")(_.contains(("B", Op.Insert, 10L)))
      assert(afterB3.size == afterB2.size + 1)

      // b4: post-eviction, the same stale replay for A IS accepted as new —
      // the tombstone is gone (the Kafka-compaction delete.retention.ms
      // contract). D's state survived, so its stale replay stays suppressed.
      input.addData(Seq(
        ev(Op.Insert, "A", 2, """{"id":"A-stale"}"""),
        ev(Op.Insert, "D", 7, """{"id":"D"}""")))
      val afterB4 = await("b4 delivered")(_.contains(("A", Op.Insert, 2L)))
      assert(!afterB4.contains(("D", Op.Insert, 7L))) // still deduped
      assert(afterB4.count(r => r._1 == "D" && r._3 == 9L) == 2) // newest re-emitted
    } finally q.stop()
  }

  test("event-time tombstone TTL: replay-deterministic eviction, survives restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ttl = java.time.Duration.ofMillis(5000)
    // event times are DATA (lsn-derived), not wall clock — the whole point
    val b1 = Seq(
      ev(Op.Insert, "X", 1000, """{"id":"X"}"""),
      ev(Op.Delete, "X", 2000, null),             // tombstone; timer at 7000
      ev(Op.Insert, "K", 1500, """{"id":"K"}"""))
    val b2 = Seq(ev(Op.Insert, "Y", 20000, """{"id":"Y"}""")) // watermark 2000 during, 20000 after
    val b3 = Seq(ev(Op.Insert, "Z", 21000, """{"id":"Z"}""")) // wm 20000 > 7000 ⇒ X evicts here
    val b4 = Seq(ev(Op.Insert, "X", 22000, """{"id":"X2"}""")) // re-creation after eviction

    final class Run(ckpt: String) {
      val input = MemoryStream[CdcEvent]
      val out = scala.collection.mutable.ArrayBuffer[Seq[(String, String, Long)]]()
      var lastStateRows = -1L
      private var q: org.apache.spark.sql.streaming.StreamingQuery = _
      def start(): Unit = {
        q = LatestState.streamingEventTimeTtl(input.toDS(), ttl)
          .writeStream
          .outputMode(LatestState.streamingOutputMode)
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcEvent], _: Long) =>
            val rows = b.collect().map(e => (e.op, e.key, e.lsn)).sorted.toSeq
            out.synchronized { if (rows.nonEmpty) out += rows }
            ()
          }
          .start()
      }
      def deliver(b: Seq[CdcEvent]): Unit = {
        input.addData(b); q.processAllAvailable()
        q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal))
          .lastOption.foreach(lastStateRows = _)
      }
      def stop(): Unit = q.stop()
    }
    def ckptDir() = java.nio.file.Files.createTempDirectory("graft_et_ttl").toString

    // --- replay determinism: two from-scratch runs, identical outputs -------
    val runs = Seq.fill(2) {
      val r = new Run(ckptDir()); r.start()
      Seq(b1, b2, b3, b4).foreach(r.deliver); r.stop(); r
    }
    assert(runs(0).out.toSeq == runs(1).out.toSeq,
      "event-time eviction must produce IDENTICAL outputs on identical input")

    // eviction fired in b3's batch and was SILENT: b3's output is Z alone,
    // no replayed tombstone for X
    val perBatch = runs(0).out.toSeq
    assert(perBatch.exists(_ == Seq((Op.Insert, "Z", 21000L))),
      s"b3 must emit only Z: $perBatch")
    assert(perBatch.flatten.count(r => r._2 == "X" && r._1 == Op.Delete) == 1,
      "the original tombstone is emitted once; eviction emits nothing")

    // state shrank: after b4, live keys are {K, Y, Z, X2}; without eviction
    // the count after b3 would still include X's tombstone
    assert(runs(0).lastStateRows == 4, s"got ${runs(0).lastStateRows}")

    // --- restart: timers + state recover from the checkpoint ----------------
    val ckpt = ckptDir()
    val r1 = new Run(ckpt); r1.start()
    Seq(b1, b2).foreach(r1.deliver); r1.stop()
    val r2 = new Run(ckpt)
    r2.input.addData(b1); r2.input.addData(b2) // same source data, new instance
    r2.start()
    r2.deliver(b3)  // recovered timer fires: X evicted in the restarted run
    assert(r2.lastStateRows == 3, // {K, Y, Z} — X's tombstone gone, K alive
      s"restarted run must evict from recovered state, got ${r2.lastStateRows}")
    r2.deliver(b4)
    r2.stop()
    assert(r2.out.toSeq.flatten.contains((Op.Insert, "X", 22000L)),
      "post-eviction re-creation accepted as new")
  }

  test("update split rewrites key-changing updates as delete+insert") {
    import spark.implicits._
    val changed = ev(Op.Update, "9", 7, """{"id":9}""").copy(before = "1")
    val same = ev(Op.Update, "1", 8, """{"id":1}""").copy(before = "1")
    val out = UpdateSplit(Seq(changed, same).toDS(), _.before).collect()
    assert(out.length == 3)
    val Array(del, ins) = out.filter(_.lsn == 7)
    assert(del.op == Op.Delete && del.key == "1" && del.after == null)
    // seqs are doubled so the synthetic insert (odd seq) can never collide
    // with the next real event of the txn
    assert(ins.op == Op.Insert && ins.key == "9" && ins.seq == 2 * changed.seq + 1)
    assert(del.seq == 2 * changed.seq)
    assert(out.filter(_.lsn == 8).head.op == Op.Update)
  }

  test("malformed payload JSON: typed decode yields nulls, not failures (log-policy analog)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val evs = Seq(
      ev(Op.Insert, "1", 1, """{"id":1,"username":"ada"}"""),
      ev(Op.Insert, "2", 2, """{not valid json"""),
      ev(Op.Insert, "3", 3, null))
    val schema = StructType(Seq(StructField("id", LongType), StructField("username", StringType)))
    val decoded = evs.toDF()
      .withColumn("row", from_json(col("after"), schema))
      .select(col("key"), col("row.id"), col("row.username"))
    val rows = decoded.collect().map(r => (r.getString(0), r.isNullAt(1)))
    assert(rows.toSeq == Seq(("1", false), ("2", true), ("3", true)))
  }

  test("error policy: log skips poison rows, exit fails the query") {
    import spark.implicits._
    val df = Seq(("ok", "x" * 10), ("poison", "y" * 100)).toDF("id", "payload")
    val kept = ErrorPolicy.maxRecordSize(df, "payload", ErrorPolicy.Log, maxBytes = 50)
    assert(kept.select("id").as[String].collect().toSeq == Seq("ok"))
    val boom = ErrorPolicy.maxRecordSize(df, "payload", ErrorPolicy.Exit, maxBytes = 50)
    val e = intercept[Exception] { boom.collect() }
    assert(e.getMessage.contains("error policy exit") ||
      Option(e.getCause).exists(_.getMessage.contains("error policy exit")))
  }

  test("topic naming: public omitted, prefix applied, names sanitized") {
    assert(TopicRouter.topicName(null, "public", "users") == "users")
    assert(TopicRouter.topicName("bw", "public", "users") == "bw.users")
    assert(TopicRouter.topicName("bw", "sales", "order items") == "bw.sales.order_20_items")
  }

  test("pg type mapping: numeric→decimal (reference bug fixed), catch-all→string") {
    import org.apache.spark.sql.types._
    assert(PgTypes.sparkType(PgTypes.Oid.Numeric, 10, 2) == DecimalType(10, 2))
    assert(PgTypes.sparkType(PgTypes.Oid.Int2) == ShortType)
    assert(PgTypes.sparkType(PgTypes.Oid.TimestampTz) == TimestampType)
    assert(PgTypes.sparkType(PgTypes.Oid.Timestamp) == TimestampNTZType)
    assert(PgTypes.sparkType(PgTypes.Oid.Uuid) == StringType)   // string fallback
    assert(PgTypes.sparkType(999999) == StringType)
    val sch = PgTypes.schemaFor(Seq(("id", PgTypes.Oid.Int8), ("name", PgTypes.Oid.Text)))
    assert(sch.fields.forall(_.nullable))                        // all union{null,T}
  }
}
