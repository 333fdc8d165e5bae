package graft.streaming

import graft.repl.{DbCatalog, Load, MetadataStore, ReplConfig}
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
  def applyBatch(spark: SparkSession, target: DbCatalog, db: String,
                 batch: DataFrame): Unit = {
    val meta = MetadataStore(spark, target.root)
    val loader = Load(spark, target, ReplConfig(dumpRoot = target.root))
    loader.applyEvents(db, batch)
    val maxId = batch.agg(max("event_id")).head()
    if (!maxId.isNullAt(0)) {
      val id = maxId.getLong(0)
      if (meta.watermark(db).forall(_ < id)) meta.commitWatermark(db, id)
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
}
