package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One tracked event per key: `ts` is the watermarked event-time column
  * (the plan's watermark node rides it); `ts_us` its exact micros twin used
  * for all gap arithmetic, so expiry decisions are integer-exact.
  */
final case class ExpiryRow(user_id: Long, lsn: Long, ts_us: Long,
    ts: java.sql.Timestamp)

/** Per-key tracking state: the newest seen event and whether its expiry has
  * already been emitted (dedup across the timer path and the next-event
  * path).
  */
final case class ExpiryState(lsn: Long, tsUs: Long, emitted: Boolean)

/** An emitted inactivity expiry: the key went `gapMs` without a newer
  * event; `last_lsn` identifies the event that went quiet and
  * `expired_at_ms` the (deterministic) registered expiry instant.
  */
final case class ExpiryEvent(user_id: Long, last_lsn: Long, expired_at_ms: Long)

/** STREAMING INACTIVITY EXPIRY — emit a record when a key sees no event for
  * `gapMs` — built on Spark 4's `transformWithState` arbitrary-state API,
  * because this operator needs the one primitive the older
  * flatMapGroupsWithState cannot express: PER-KEY EVENT-TIME TIMERS. A
  * group-state timeout fires at most once per key per timeout-arm and only
  * when the group is next scheduled; a registered timer fires exactly at
  * its event-time instant once the watermark passes it, independent of new
  * input for the key — which is the semantics "this user went quiet" needs
  * (session-end notifications, cart-abandonment triggers, sensor-offline
  * alerts: the complement of [[graft.operators.Sessionize]]'s batch view).
  *
  * Semantics (deterministic, oracle-checkable): for each key, every event
  * whose NEXT event (by (ts, lsn)) is more than `gapMs` later — or that has
  * no next event — produces exactly one ExpiryEvent at
  * `ts_ms + gapMs`. Mid-stream gaps emit on the next event's arrival if the
  * timer has not already fired (the `emitted` flag makes the two paths
  * emit-once regardless of watermark timing); tail gaps emit from the timer
  * once the watermark passes. Non-advancing inputs (at-least-once replays)
  * emit nothing and re-arm nothing — and the API itself drops rows
  * at-or-below the watermark before they reach the processor
  * (spec-pinned), so cross-batch replays never even arrive.
  *
  * Scale shape: state is ONE small row + one pending timer per key (RocksDB
  * provider required by transformWithState — exactly the off-heap
  * configuration billions of keys need); each input batch does O(batch)
  * work plus timer fires, and the emitted stream is append-only immutable
  * facts. In production, pair the state with a TTL
  * (`TTLConfig(Duration.ofDays(...))`) to bound dead-key state; the gate's
  * bounded drive keeps TTL off so the oracle's full-history view matches.
  */
object InactivityExpiry {

  /** Typed core: `rows` must already carry a watermark on `ts`. */
  def expiriesTyped(rows: Dataset[ExpiryRow], gapMs: Long): Dataset[ExpiryEvent] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new InactivityExpiryProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Events-stream adapter: watermark + exact-micros projection. */
  def expiries(events: DataFrame, gapMs: Long): Dataset[ExpiryEvent] = {
    import events.sparkSession.implicits._
    expiriesTyped(
      events.withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("event_id").as("lsn"),
          unix_micros(col("ts")).as("ts_us"), col("ts"))
        .as[ExpiryRow],
      gapMs)
  }
}

class InactivityExpiryProcessor(gapMs: Long)
    extends StatefulProcessor[Long, ExpiryRow, ExpiryEvent] {
  @transient private var st: ValueState[ExpiryState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[ExpiryState]("last",
      Encoders.product[ExpiryState], TTLConfig.NONE)

  // registered timer value == emitted expired_at_ms == ts_us/1000 + gapMs:
  // one definition shared by both emit paths keeps the output deterministic
  private def expiryMsOf(s: ExpiryState): Long = s.tsUs / 1000 + gapMs
  private def gapUs: Long = gapMs * 1000

  override def handleInputRows(key: Long, rows: Iterator[ExpiryRow],
      tv: TimerValues): Iterator[ExpiryEvent] = {
    val out = Seq.newBuilder[ExpiryEvent]
    val entry = if (st.exists()) st.get() else null
    var cur = entry
    rows.toSeq.sortBy(e => (e.ts_us, e.lsn)).foreach { e =>
      if (cur == null) cur = ExpiryState(e.lsn, e.ts_us, emitted = false)
      else if (e.ts_us > cur.tsUs || (e.ts_us == cur.tsUs && e.lsn > cur.lsn)) {
        // a mid-stream gap emits HERE when its timer has not fired yet —
        // strict >, matching the oracle's `nxt - ts > gap`
        if (!cur.emitted && e.ts_us - cur.tsUs > gapUs)
          out += ExpiryEvent(key, cur.lsn, expiryMsOf(cur))
        cur = ExpiryState(e.lsn, e.ts_us, emitted = false)
      } // else: non-advancing replay — silent
    }
    if (cur ne entry) {
      // re-arm: drop the superseded pending timer (fired timers are gone;
      // the emitted flag, not the timer table, carries that fact)
      if (entry != null && !entry.emitted) getHandle.deleteTimer(expiryMsOf(entry))
      st.update(cur)
      getHandle.registerTimer(expiryMsOf(cur))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[ExpiryEvent] = {
    if (!st.exists()) return Iterator.empty
    val cur = st.get()
    // guard on the CURRENT state's expiry: a stale timer (deleted-then-
    // raced, or left by a crash before this batch's state commit) must not
    // emit for a state that has since advanced
    if (!cur.emitted && info.getExpiryTimeInMs == expiryMsOf(cur)) {
      st.update(cur.copy(emitted = true))
      Iterator.single(ExpiryEvent(key, cur.lsn, expiryMsOf(cur)))
    } else Iterator.empty
  }
}
