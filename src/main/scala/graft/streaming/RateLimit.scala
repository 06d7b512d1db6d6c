package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One candidate event: `ts_us` exact event-time micros, `lsn` the
  * commit-order tiebreak.
  */
final case class ThrottleIn(user_id: Long, lsn: Long, ts_us: Long)

/** An ADMITTED event with its in-window slot (1-based — slot ≤ limit by
  * construction).
  */
final case class Admitted(user_id: Long, lsn: Long, slot: Long)

/** STREAMING PER-KEY RATE LIMITING — admit at most `limit` events per key
  * per tumbling window, drop the rest — the throttle/anti-abuse primitive
  * (q103's batch debounce generalized to a quota, executed by the state
  * store). Second `transformWithState` operator in the library, this one
  * exercising the API surface cdc49 doesn't: MAP STATE (per-open-window
  * admission counts — a value-state would hold one window, a real key
  * straddles several) and `TimeMode.None` (no timers, no watermark — the
  * quota needs only arrival order).
  *
  * Determinism: within a batch, rows process in (ts, lsn) order; a per-key
  * lsn high-water mark makes non-advancing replays silent (the
  * at-least-once discipline — without it a redelivered admitted event
  * would double-count its window and steal a later event's slot).
  *
  * Scale shape: state per key = one long + one (window → count) map whose
  * size is the number of OPEN windows a key straddles (bounded by the
  * key's activity span ÷ window, and prunable: entries for windows below
  * the high-water mark's window can never admit again once events arrive
  * in order — production pairs this with a TTL). Output is O(admitted).
  */
object RateLimit {

  def throttleTyped(rows: Dataset[ThrottleIn], windowMs: Long, limit: Int)
      : Dataset[Admitted] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new ThrottleProcessor(windowMs, limit),
        TimeMode.None(), OutputMode.Append())
  }

  /** Events-stream adapter. */
  def throttle(events: DataFrame, windowMs: Long, limit: Int)
      : Dataset[Admitted] = {
    import events.sparkSession.implicits._
    throttleTyped(
      events.select(col("user_id"), col("event_id").as("lsn"),
        unix_micros(col("ts")).as("ts_us")).as[ThrottleIn],
      windowMs, limit)
  }
}

class ThrottleProcessor(windowMs: Long, limit: Int)
    extends StatefulProcessor[Long, ThrottleIn, Admitted] {
  @transient private var counts: MapState[Long, Long] = _
  @transient private var highWater: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[Long, Long]("win_counts",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    highWater = getHandle.getValueState[Long]("hw",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[ThrottleIn],
      tv: TimerValues): Iterator[Admitted] = {
    val out = Seq.newBuilder[Admitted]
    var hw = if (highWater.exists()) highWater.get() else Long.MinValue
    rows.toSeq.sortBy(e => (e.ts_us, e.lsn)).foreach { e =>
      if (e.lsn > hw) { // non-advancing replay: silent
        hw = e.lsn
        val w = e.ts_us / 1000 - (e.ts_us / 1000) % windowMs
        val n = if (counts.containsKey(w)) counts.getValue(w) else 0L
        if (n < limit) {
          counts.updateValue(w, n + 1)
          out += Admitted(key, e.lsn, n + 1)
        }
      }
    }
    highWater.update(hw)
    out.result().iterator
  }
}
