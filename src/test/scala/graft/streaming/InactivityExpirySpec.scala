package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch semantics of the transformWithState inactivity-expiry
  * operator — the interleavings the gate's single-real-batch drive cannot
  * reach: timer-path emission between batches, the emitted-flag dedup when
  * an advancing event lands AFTER its predecessor's timer already fired,
  * and at-least-once replay silence.
  */
class RateLimitSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def r(u: Long, lsn: Long, tUs: Long) = ThrottleIn(u, lsn, tUs)

  test("quota persists across batches; replays silent; windows independent") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ThrottleIn]
    val ckpt = java.nio.file.Files.createTempDirectory("rl_tws").toString
    val q = RateLimit.throttleTyped(input.toDS(), windowMs = 1000L, limit = 2)
      .toDF()
      .writeStream.format("memory").queryName("rl_tws").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // b1 — u1: three events in window [0,1000): only 2 admitted, in
      // (ts, lsn) order despite unsorted arrival
      input.addData(r(1, 3, 500_000), r(1, 1, 100_000), r(1, 2, 300_000))
      q.processAllAvailable()
      // b2 — the window's quota is FULL from b1 (state persisted): a new
      // event in it is rejected; the next window admits fresh; a full
      // replay of b1 is silent (high-water mark)
      input.addData(r(1, 4, 700_000), r(1, 5, 1_200_000),
        r(1, 3, 500_000), r(1, 1, 100_000))
      q.processAllAvailable()
      val got = spark.table("rl_tws").as[Admitted].collect().toSet
      assert(got == Set(Admitted(1, 1, 1), Admitted(1, 2, 2),
        Admitted(1, 5, 1)))
    } finally q.stop()
  }
}

class ErrorStreakSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }
  private def r(u: Long, lsn: Long, err: Boolean) =
    StreakIn(u, lsn, lsn * 1000, err)

  test("streak spans batches; one alert per maximal run; reset; replay silent") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreakIn]
    val ckpt = java.nio.file.Files.createTempDirectory("es_tws").toString
    val q = ErrorStreak.streaksTyped(input.toDS(), threshold = 3)
      .toDF()
      .writeStream.format("memory").queryName("es_tws").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // b1 — u1: two errors (streak in-flight, state carries it); u2: a
      // run broken mid-batch never alerts
      input.addData(r(1, 1, true), r(1, 2, true),
        r(2, 1, true), r(2, 2, false), r(2, 3, true))
      q.processAllAvailable()
      // b2 — u1's third consecutive error arrives IN A LATER BATCH (the
      // cross-batch list state); the 4th and 5th stay silent (one alert
      // per maximal run); u2 completes a fresh run
      input.addData(r(1, 3, true), r(1, 4, true), r(1, 5, true),
        r(2, 4, true), r(2, 5, true))
      q.processAllAvailable()
      // b3 — full replay of b1 (silent); a reset then a NEW completed run
      // alerts again
      input.addData(r(1, 1, true), r(1, 2, true),
        r(1, 6, false), r(1, 7, true), r(1, 8, true), r(1, 9, true))
      q.processAllAvailable()
      val got = spark.table("es_tws").as[StreakAlert].collect().toSet
      assert(got == Set(
        StreakAlert(1, 1, 2, 3),   // spans b1→b2
        StreakAlert(2, 3, 4, 5),   // run restarted after the mid-b1 break
        StreakAlert(1, 7, 8, 9)))  // new run after the reset
    } finally q.stop()
  }
}

class InactivityExpirySpec extends AnyFunSuite {
  // transformWithState requires the RocksDB provider; isolate it on a new
  // session so the shared suite session keeps the default store
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val H = 3600L // seconds
  private val t0 = 1_000_000_000L // seconds epoch
  private def row(u: Long, lsn: Long, tSec: Long) =
    ExpiryRow(u, lsn, tSec * 1000000L, new java.sql.Timestamp(tSec * 1000L))
  private def e(u: Long, lsn: Long, tSec: Long) = // expected expiry: t + 2h
    ExpiryEvent(u, lsn, tSec * 1000L + 2 * H * 1000L)

  test("cross-batch gaps: inline + timer paths emit once each; replays silent") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ExpiryRow]
    val ckpt = java.nio.file.Files.createTempDirectory("exp_tws").toString
    val q = InactivityExpiry.expiriesTyped(
        input.toDS().withWatermark("ts", "0 seconds"), gapMs = 2 * H * 1000L)
      .toDF()
      .writeStream.format("memory").queryName("exp_tws").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // b1 — u1 carries an INTRA-batch 3h gap (inline emit); u3's single
      // event arms a timer the advancing watermark (t0+3h) will fire
      input.addData(row(1, 1, t0), row(1, 2, t0 + 3 * H), row(3, 31, t0))
      q.processAllAvailable()
      // b2 — u1/u2 advance (u1's pending 5h timer races its own next event:
      // the inline path wins, exactly one emit; the in-batch duplicate of
      // u1's row is non-advancing and silent); u3 advances AFTER its timer
      // fired — the emitted flag must suppress a duplicate. u3's event sits
      // strictly above b1's watermark (t0+3h): transformWithState drops
      // late rows outright, so an at-or-below-watermark event never reaches
      // the processor (spec'd implicitly by b3 below).
      input.addData(row(1, 3, t0 + 10 * H), row(1, 3, t0 + 10 * H),
        row(2, 9, t0 + 10 * H), row(3, 32, t0 + 4 * H))
      q.processAllAvailable()
      // b3 — full at-least-once replay of everything so far: silent
      input.addData(row(1, 1, t0), row(1, 2, t0 + 3 * H), row(3, 31, t0),
        row(1, 3, t0 + 10 * H), row(2, 9, t0 + 10 * H), row(3, 32, t0 + 4 * H))
      q.processAllAvailable()
      // b4 — far-future watermark push fires every tail timer (u99's own
      // expiry sits past the final watermark and never fires)
      input.addData(row(99, 0, t0 + 1000 * H))
      q.processAllAvailable()
      val got = spark.table("exp_tws").as[ExpiryEvent].collect()
        .filter(_.user_id < 99).toSeq
      val want = Seq(
        e(1, 1, t0), e(1, 2, t0 + 3 * H), e(1, 3, t0 + 10 * H),
        e(2, 9, t0 + 10 * H),
        e(3, 31, t0), e(3, 32, t0 + 4 * H))
      assert(got.sortBy(x => (x.user_id, x.last_lsn)) ==
        want.sortBy(x => (x.user_id, x.last_lsn)))
      // exactly once each — no duplicate from the timer/inline race or the
      // replay batch
      assert(got.size == got.distinct.size)
    } finally q.stop()
  }
}
