package graft.cdc

import graft.SparkTestSession
import graft.streaming.KafkaSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The error-policy matrix of spec/functional/error_handling_spec.rb:23–147,
  * beyond the oversize-row guard (covered in CdcSpec): registry-down and
  * sink-down failures, × {exit, log}. Exit aborts (the process-crash analog
  * — no silent loss); Log skips and keeps the pipeline alive.
  */
class ErrorMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schemas = Map(
    "public.things" -> KafkaSink.TopicSchemas(
      PgTypes.schemaFor(Seq("id" -> PgTypes.Oid.Int4)).json,
      PgTypes.schemaFor(Seq("id" -> PgTypes.Oid.Int4, "thing" -> PgTypes.Oid.Int4)).json))

  private def ev(op: String, key: String, lsn: Long, after: String): CdcEvent =
    CdcEvent(op, "public.things", lsn, lsn / 10, 0, key, null, after)

  // --- registry down (error_handling_spec.rb:37–52 exit, :92–117 log) -------

  test("registry down × exit: registration aborts before anything is produced") {
    val registry = new MockSchemaRegistry
    registry.available = false
    val e = intercept[IllegalStateException] {
      KafkaSink.registerAll(schemas, "bw", registry, ErrorPolicy.Exit)
    }
    assert(e.getMessage.contains("error policy exit"))
  }

  test("registry down × log: messages unsent, pipeline alive; recovery works") {
    import spark.implicits._
    val registry = new MockSchemaRegistry
    registry.available = false
    // no throw; the failed table is dropped from the routing set
    val ids = KafkaSink.registerAll(schemas, "bw", registry, ErrorPolicy.Log)
    assert(ids.isEmpty)
    val envelopes = Seq(ev(Op.Insert, """{"id":1}""", 1, """{"id":1,"thing":42}""")).toDS()
    assert(KafkaSink.producerRows(envelopes, ids, 16).count() == 0)

    // registry comes back (the rb spec's "subsequent messages" scenario):
    // re-registration succeeds and the same envelopes now produce
    registry.available = true
    val ids2 = KafkaSink.registerAll(schemas, "bw", registry, ErrorPolicy.Log)
    assert(ids2.keySet == schemas.keySet)
    assert(KafkaSink.producerRows(envelopes, ids2, 16).count() == 1)
  }

  // --- sink down (error_handling_spec.rb:29–36 exit, :83–90 log) ------------

  test("sink failure × exit: the streaming query dies on the poison batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = input.toDS().writeStream
      .foreachBatch(ErrorPolicy.guardedBatchSink[CdcEvent](ErrorPolicy.Exit, "kafka produce") {
        (_, _) => throw new RuntimeException("broker down")
      })
      .start()
    try {
      input.addData(ev(Op.Insert, """{"id":1}""", 1, """{"id":1,"thing":42}"""))
      intercept[Exception] { q.processAllAvailable() }
      assert(q.exception.isDefined)   // aborted, not silently skipped
    } finally q.stop()
  }

  test("sink failure × log: poison batch skipped, later batches delivered") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val input = MemoryStream[CdcEvent]
    val q = input.toDS().writeStream
      .foreachBatch(ErrorPolicy.guardedBatchSink[CdcEvent](ErrorPolicy.Log, "kafka produce") {
        (batch, _) =>
          val keys = batch.select("key").collect().map(_.getString(0))
          if (keys.exists(_.contains("poison"))) throw new RuntimeException("broker down")
          keys.foreach(delivered.add)
      })
      .start()
    try {
      input.addData(ev(Op.Insert, """{"id":"poison"}""", 1, """{"id":1}"""))
      q.processAllAvailable()          // sink throws; Log swallows, query lives
      assert(q.exception.isEmpty)
      input.addData(ev(Op.Insert, """{"id":2}""", 2, """{"id":2,"thing":7}"""))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      assert(delivered.contains("""{"id":2}"""))      // later batch delivered
      assert(!delivered.contains("""{"id":"poison"}""")) // poison batch skipped
    } finally q.stop()
  }

  // --- dead-letter split (the production third column of the matrix) --------

  test("deadLetter: disjoint, complete, annotated; NULL predicate rows are good") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "ok"), (2L, "poison"), (3L, null), (4L, "ok2"))
      .toDF("id", "payload")
    val (good, dead) = ErrorPolicy.deadLetter(rows,
      col("payload") === "poison", "poison payload")
    val g = good.select("id").as[Long].collect().toSet
    val d = dead.select("id").as[Long].collect().toSet
    assert(g.intersect(d).isEmpty && (g ++ d) == Set(1L, 2L, 3L, 4L))
    // NULL predicate (id 3, payload null) lands in good — the same row
    // ErrorPolicy.guard's Log keeps, so DLQ'ing a pipeline never changes
    // the surviving stream
    assert(g == Set(1L, 3L, 4L) && d == Set(2L))
    assert(dead.select("dlq_reason").as[String].collect().toSeq ==
      Seq("poison payload"))
    assert(good.columns.toSeq == Seq("id", "payload"), "good side unchanged")
  }

  test("streaming DLQ: poison ROWS land queryable, good rows flow, query lives") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val dlq = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
    val input = MemoryStream[CdcEvent]
    val q = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CdcEvent], _: Long) =>
        val (good, dead) = ErrorPolicy.deadLetter(batch.toDF(),
          col("key").contains("poison"), "unparseable key")
        good.select("key").collect().foreach(r => delivered.add(r.getString(0)))
        dead.select("key", "dlq_reason").collect()
          .foreach(r => dlq.add((r.getString(0), r.getString(1))))
      }
      .start()
    try {
      input.addData(
        ev(Op.Insert, """{"id":"poison"}""", 1, """{"id":1}"""),
        ev(Op.Insert, """{"id":2}""", 2, """{"id":2,"thing":7}"""))
      q.processAllAvailable()
      assert(q.exception.isEmpty)                      // pipeline alive
      assert(delivered.contains("""{"id":2}"""))       // good row delivered
      assert(!delivered.contains("""{"id":"poison"}"""))
      // unlike Log (which loses the whole poison batch), the poison ROW is
      // retained with its reason — replayable after the fix
      assert(dlq.contains(("""{"id":"poison"}""", "unparseable key")))
    } finally q.stop()
  }

  // --- upfront relid validation (the catalog analog of the per-JVM check) ---

  test("validateRelids: clean set passes, synthetic collision fails loudly") {
    val ok = AvroFrame.validateRelids(Seq("public.users", "public.orders", "crm.leads"))
    assert(ok.size == 3 && ok.values.toSet.size == 3)
    // hashCode collision pair (classic "Aa"/"BB" family)
    val e = intercept[IllegalArgumentException] {
      AvroFrame.validateRelids(Seq("Aa", "BB"))
    }
    assert(e.getMessage.contains("relid collision"))
  }

  test("colliding table names fail at pipeline start on the driver, not mid-stream") {
    // registerAll is a pipeline entry that knows its full table set: the
    // collision must abort registration itself — regardless of error policy,
    // which governs per-table registry failures, not an invalid table set
    val colliding = Map(
      "Aa" -> schemas("public.things"),
      "BB" -> schemas("public.things"))
    val registry = new MockSchemaRegistry
    val e = intercept[IllegalArgumentException] {
      KafkaSink.registerAll(colliding, "bw", registry, ErrorPolicy.Log)
    }
    assert(e.getMessage.contains("relid collision"))
    assert(registry.subjects.isEmpty, "nothing may be registered after a collision")
  }
}
