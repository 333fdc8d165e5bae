package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization closed by EVENT-TIME TIMERS on the
  * arbitrary-state API — the streaming twin of the batch session windows
  * in [[EventStreams]]: a session closes exactly when the WATERMARK passes
  * `last event + gap`, not when some later batch happens to revisit the
  * key. `flatMapGroupsWithState` approximates this with per-batch timeout
  * checks; `transformWithState` makes the expiry a first-class timer the
  * state store fires ([[SessionProcessor.handleExpiredTimer]]), which is
  * the correct semantics under bursty keys: a key with NO new input still
  * closes on time.
  *
  * State per key: one fixed-size aggregate (count/sum/bounds) plus one
  * registered timer — bounded regardless of session length, re-registered
  * (old timer deleted) as events extend the session. Keys are hash-
  * partitioned by the engine; the RocksDB store checkpoints both state
  * and timers, so a restarted query resumes with its pending expiries.
  */
object SessionTimers {

  final case class Ev(user: String, ts: java.sql.Timestamp, value: Double)
  final case class Session(user: String, nEvents: Long, totalValue: Double,
                           startMs: Long, endMs: Long)
  final case class Agg(n: Long, sum: Double, startMs: Long, endMs: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Ev, Session] {
    @transient private var agg: ValueState[Agg] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[Agg]("agg", Encoders.product[Agg], TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: String, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Session] = {
      var a = if (agg.exists()) agg.get() else Agg(0L, 0d, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        val t = e.ts.getTime
        a = Agg(a.n + 1, a.sum + e.value, math.min(a.startMs, t), math.max(a.endMs, t))
      }
      agg.update(a)
      // one live timer per key: slide it to lastEvent + gap
      val expiry = a.endMs + gapMs
      if (timerAt.exists() && timerAt.get() != expiry)
        getHandle.deleteTimer(timerAt.get())
      getHandle.registerTimer(expiry)
      timerAt.update(expiry)
      Iterator.empty
    }

    override def handleExpiredTimer(user: String, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Session] = {
      if (!agg.exists()) return Iterator.empty
      val a = agg.get()
      agg.clear(); timerAt.clear()
      Iterator.single(Session(user, a.n, a.sum, a.startMs, a.endMs))
    }
  }

  /** Closed sessions of an event stream, emitted when the watermark passes
    * each session's gap. `in` must carry a watermark on `ts`.
    */
  def sessions(spark: SparkSession, in: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    in.groupByKey(_.user)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
