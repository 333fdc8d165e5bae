package graft.streaming

import graft.repl.{DbCatalog, Load, ReplConfig, ReplTarget}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous incremental replication as Structured Streaming — the
  * always-on form of the reference's scheduled batch runs
  * (`/root/reference/README.md:64-90` shows cron-style invocations; the
  * engine replaces "rerun the script every N minutes" with a streaming
  * query over the source change log).
  *
  * `readStream` tails the source event log (parquet file source discovers
  * appended files); `foreachBatch` applies each micro-batch through the
  * SAME merge path as batch replication ([[graft.repl.Load]] semantics) and
  * commits the watermark last. Exactly-once effect = Spark's checkpointed
  * offsets (at-least-once delivery) × idempotent merge (same delta twice ≡
  * once) — the identical contract the reference builds from retries +
  * idempotent REPL LOAD (`beeline_functions.sh:212-236`).
  */
object StreamingReplication {

  /** One micro-batch application: merge the batch's events into the target
    * and advance the watermark. Public for direct use in foreachBatch.
    */
  def applyBatch(spark: SparkSession, target: ReplTarget, db: String,
                 batch: DataFrame): Unit = {
    val loader = Load(spark, target, ReplConfig(dumpRoot = ""))
    loader.applyEvents(db, batch): Unit // streaming cost rides query progress, not RunReports
    val maxId = batch.agg(max("event_id")).head()
    if (!maxId.isNullAt(0)) {
      val id = maxId.getLong(0)
      if (target.watermark(db).forall(_ < id)) target.commitWatermark(db, id)
    }
  }

  /** Streaming replication of one db's change log. */
  def replicateStream(spark: SparkSession, source: DbCatalog, target: DbCatalog,
                      db: String, checkpointDir: String,
                      oneShot: Boolean = true): StreamingQuery = {
    val events = spark.readStream
      .schema(DbCatalog.EventSchema)
      .parquet(s"${source.root}/$db/${DbCatalog.EventsTable}")
    val writer = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, target, db, batch)
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else
      writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Always-on replication from ANY [[graft.repl.ReplSource]] — including a
    * live JDBC endpoint ([[graft.repl.JdbcSource]]), whose change log is a
    * remote TABLE rather than an appendable file directory, so the parquet
    * file source above cannot tail it. Here the replica WATERMARK is the
    * streaming offset: each trigger pulls `event_id > watermark` (the
    * predicate pushed into the remote WHERE clause), applies it through the
    * same idempotent merge, and commits the watermark last. A tick that
    * crashes mid-apply replays the same delta next trigger — idempotent
    * merge × watermark-commit-last gives the exactly-once EFFECT without
    * needing source-side offsets, which is what lets one mechanism serve
    * file logs, Derby, or any JDBC-reachable change table.
    *
    * (The rate ticker is lifecycle only — start/stop/awaitTermination; its
    * rows are ignored. Offsets live in the watermark, not the checkpoint.)
    */
  def replicatePolled(spark: SparkSession, source: graft.repl.ReplSource,
                      target: ReplTarget, db: String, checkpointDir: String,
                      oneShot: Boolean = true,
                      pollInterval: String = "10 seconds"): StreamingQuery = {
    val ticks = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    val writer = ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        val wm = target.watermark(db).getOrElse(0L)
        // PIN the delta before applying: the merge reads its event frame
        // several times (DDL scan, touched-table list, per-table DML), and
        // re-running those against a LIVE remote table would see different
        // snapshots as the source keeps writing — localCheckpoint gives one
        // consistent epoch per tick (and keeps post-scan predicates in
        // Spark instead of re-pushed remote SQL).
        val delta = source.readEventsAfter(db, wm).localCheckpoint()
        if (!delta.isEmpty) applyBatch(spark, target, db, delta)
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else
      writer.trigger(Trigger.ProcessingTime(pollInterval))).start()
  }
}
