package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

final case class StreakIn(user_id: Long, lsn: Long, ts_us: Long,
    is_error: Boolean)

/** A streak alert: the key's 3rd CONSECUTIVE error, carrying the whole
  * streak's lsns — the payload an incident ticket ships.
  */
final case class StreakAlert(user_id: Long, lsn1: Long, lsn2: Long, lsn3: Long)

/** STREAMING CONSECUTIVE-FAILURE ALERTS — emit once when a key's run of
  * consecutive error events REACHES the threshold (3), carrying every lsn
  * in the streak; longer runs stay silent past the alert and any
  * non-error resets. The sequence-pattern alert (the MATCH_RECOGNIZE
  * "A{3,}" shape) executed by the state store — q86's batch conformance
  * rules, live.
  *
  * Third `transformWithState` operator, completing the state-type
  * coverage: cdc49 = ValueState + event-time timers, cdc52 = MapState,
  * this = LIST STATE — the recent-K payload pattern (the list holds the
  * in-progress streak's lsns, capped at the threshold, cleared on reset;
  * a value-state counter could fire the alert but could not CARRY the
  * evidence). Replays are lsn-high-water silent, as everywhere.
  */
object ErrorStreak {

  def streaksTyped(rows: Dataset[StreakIn], threshold: Int)
      : Dataset[StreakAlert] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new StreakProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }

  def streaks(events: DataFrame, threshold: Int = 3): Dataset[StreakAlert] = {
    import events.sparkSession.implicits._
    streaksTyped(
      events.select(col("user_id"), col("event_id").as("lsn"),
        unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "error").as("is_error")).as[StreakIn],
      threshold)
  }
}

class StreakProcessor(threshold: Int)
    extends StatefulProcessor[Long, StreakIn, StreakAlert] {
  require(threshold == 3, "StreakAlert carries exactly 3 lsns")
  @transient private var streak: ListState[Long] = _
  @transient private var highWater: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    streak = getHandle.getListState[Long]("streak",
      Encoders.scalaLong, TTLConfig.NONE)
    highWater = getHandle.getValueState[Long]("hw",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StreakIn],
      tv: TimerValues): Iterator[StreakAlert] = {
    val out = Seq.newBuilder[StreakAlert]
    var hw = if (highWater.exists()) highWater.get() else Long.MinValue
    var run = if (streak.exists()) streak.get().toList else Nil
    rows.toSeq.sortBy(e => (e.ts_us, e.lsn)).foreach { e =>
      if (e.lsn > hw) { // non-advancing replay: silent
        hw = e.lsn
        if (e.is_error) {
          // cap at threshold: past the alert the run's length no longer
          // matters, only that it is unbroken (list stays O(threshold))
          if (run.length < threshold) run = run :+ e.lsn
          if (run.length == threshold && run.last == e.lsn)
            out += StreakAlert(key, run.head, run(1), run(2))
        } else run = Nil
      }
    }
    highWater.update(hw)
    if (run.isEmpty) streak.clear() else streak.put(run.toArray)
    out.result().iterator
  }
}
