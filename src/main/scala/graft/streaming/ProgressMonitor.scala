package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-table replication-progress monitor on the arbitrary-state API
  * (`transformWithState`, the Spark 4.x successor of `mapGroupsWithState`):
  * for every table in an applied-events stream, maintain the running event
  * count and high watermark, emitting one progress row per table per
  * micro-batch — the continuously-updated form of the reference's post-load
  * `REPL STATUS` check (`/root/reference/hive3repl.sh:105-120`), kept as
  * queryable state instead of a log line.
  *
  * State per key is two longs in the checkpointed store (the API requires
  * the RocksDB state-store provider), partitioned by table — no driver
  * state, no unbounded growth: tables are control-plane cardinality, and
  * TTL support is available per state variable when keys churn (not needed
  * for table names).
  */
object ProgressMonitor {

  final case class Applied(table: String, eventId: Long)
  final case class Progress(table: String, totalEvents: Long,
                            maxEventId: Long, batchNew: Long)

  class Processor extends StatefulProcessor[String, Applied, Progress] {
    @transient private var count: ValueState[Long] = _
    @transient private var maxId: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      maxId = getHandle.getValueState[Long]("maxId", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(table: String, rows: Iterator[Applied],
                                 timers: TimerValues): Iterator[Progress] = {
      var n = 0L
      var mx = if (maxId.exists()) maxId.get() else Long.MinValue
      rows.foreach { r => n += 1; if (r.eventId > mx) mx = r.eventId }
      val total = (if (count.exists()) count.get() else 0L) + n
      count.update(total)
      maxId.update(mx)
      Iterator.single(Progress(table, total, mx, n))
    }
  }

  /** Running per-table progress of an applied-events stream. */
  def progress(spark: SparkSession, in: Dataset[Applied]): Dataset[Progress] = {
    import spark.implicits._
    in.groupByKey(_.table)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
