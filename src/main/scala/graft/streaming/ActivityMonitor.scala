package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-user activity state on the remaining arbitrary-state primitives —
  * [[MapState]] (event-type → running count: point lookups and updates,
  * no read-modify-write of a whole map blob) and [[ListState]] (a bounded
  * recent-values buffer: append-only writes, trimmed on read) — completing
  * the `transformWithState` surface next to [[ProgressMonitor]]'s
  * ValueState and [[SessionTimers]]' event-time timers.
  *
  * The state-shape choice IS the scale story: a MapState entry is a
  * separate store key, so a user with 10⁴ event types still updates one
  * entry per row; the recent list is capped at `keepK` (trim on write), so
  * state per user is O(types + keepK) forever — no unbounded growth, no
  * per-batch full-map rewrite. RocksDB-backed and checkpointed like every
  * transformWithState query.
  */
object ActivityMonitor {

  final case class Ev(user: String, kind: String, value: Double)
  final case class Activity(user: String, kinds: Long, totalEvents: Long,
                            recentSum: Double)

  class Processor(keepK: Int) extends StatefulProcessor[String, Ev, Activity] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Double]("recent",
        Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(user: String, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Activity] = {
      rows.foreach { e =>
        val prev = if (counts.containsKey(e.kind)) counts.getValue(e.kind) else 0L
        counts.updateValue(e.kind, prev + 1)
        recent.appendValue(e.value)
      }
      val kept = recent.get().toSeq.takeRight(keepK)
      recent.put(kept.toArray) // trim: bounded state per key
      val kinds = counts.keys().size.toLong
      val total = counts.values().foldLeft(0L)(_ + _)
      Iterator.single(Activity(user, kinds, total, kept.sum))
    }
  }

  /** Running per-user activity over an event stream: distinct kinds seen,
    * total events, and the sum of the `keepK` most recent values.
    */
  def activity(spark: SparkSession, in: Dataset[Ev], keepK: Int = 5): Dataset[Activity] = {
    import spark.implicits._
    in.groupByKey(_.user)
      .transformWithState(new Processor(keepK), TimeMode.None(), OutputMode.Update())
  }
}
