package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: emit only the FIRST occurrence of each
  * key across all micro-batches — `mapGroupsWithState` keeping one boolean
  * per key (SURVEY.md §2.3 "streaming: stateful ops" row; the streaming
  * form of [[graft.operators.Dedup.exact]] for a continuously-ingested
  * corpus).
  *
  * State is per-key in the checkpointed state store — bounded by distinct
  * keys, partitioned by Spark, never on the driver. For 100 TB-scale
  * ingest the key should be the content hash (md5/h48), so state is
  * 16-24 bytes per distinct document.
  */
object StatefulDedup {

  final case class Keyed(key: String, id: Long)
  final case class FirstSeen(key: String, id: Long, isFirst: Boolean)

  /** For each key group in the batch, emit the smallest id if the key was
    * never seen before; afterwards remember it forever.
    */
  def firstOccurrences(spark: SparkSession, in: Dataset[Keyed]): Dataset[FirstSeen] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .mapGroupsWithState[Boolean, FirstSeen](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          val minId = rows.map(_.id).min
          if (state.exists) FirstSeen(key, minId, isFirst = false)
          else { state.update(true); FirstSeen(key, minId, isFirst = true) }
      }
  }

  final case class Ev(user_id: Long, tsMs: Long)
  final case class Session(user_id: Long, startMs: Long, endMs: Long, n: Long)

  /** Gap-based session emitter via `flatMapGroupsWithState` (Append mode
    * with processing-time timeout): per-user state holds the open
    * session; a session row is EMITTED (not updated) once the gap or the
    * timeout closes it — the custom-state form of `session_window` for
    * when the session payload needs engine-defined logic. State per key
    * is one open session (three longs), checkpointed.
    */
  def sessionEmitter(spark: SparkSession, in: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Session]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val s = state.get; state.remove(); Iterator.single(s)
          } else {
            val sorted = rows.toSeq.sortBy(_.tsMs)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsMs - s.endMs <= gapMs =>
                  open = Some(s.copy(endMs = e.tsMs, n = s.n + 1))
                case Some(s) =>
                  closed += s
                  open = Some(Session(user, e.tsMs, e.tsMs, 1))
                case None =>
                  open = Some(Session(user, e.tsMs, e.tsMs, 1))
              }
            }
            open.foreach { s => state.update(s); state.setTimeoutDuration(gapMs) }
            closed.result().iterator
          }
      }
  }

  /** Streaming entry: dedup a stream of (key, id) and keep only firsts. */
  def run(spark: SparkSession, in: Dataset[Keyed], checkpoint: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    firstOccurrences(spark, in)
      .filter(_.isFirst)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
