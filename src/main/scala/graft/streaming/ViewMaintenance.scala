package graft.streaming

import graft.operators.Warehouse
import graft.util.VersionedView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}

/** Streaming incremental view maintenance: a CDC stream of
  * (op ∈ I/D, key, measure) rows maintains a materialized per-key aggregate
  * (count + additive sum) through `foreachBatch` — the always-on form of
  * [[graft.operators.Warehouse.maintainAgg]], exactly as
  * [[StreamingReplication]] is the always-on form of the batch replication
  * cycle (reference context: the cron loop in
  * `/root/reference/README.md:64-90`).
  *
  * Exactly-once effect = Spark's checkpointed offsets (at-least-once
  * micro-batch delivery) × the idempotent versioned commit of
  * [[graft.util.VersionedView]] (atomic pointer swap; replayed batches
  * no-op; crash windows recover by overwrite-replay).
  *
  * 100 TB shape: per trigger, cost ∝ micro-batch delta (map-side-combined
  * signed aggregate) + one full-outer merge against the current view, same
  * as the batch operator; the versioned-directory swap is the same pattern
  * the replication plane uses for partition swaps, and keep-two pruning
  * bounds storage.
  */
object ViewMaintenance {

  val ViewSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("cnt", LongType),
    StructField("sum_m", DecimalType(38, 2))))

  /** (committedBatchId, version); None before the first commit. */
  def committed(spark: SparkSession, viewDir: String): Option[(Long, Long)] =
    VersionedView(spark, viewDir).committed

  /** The current materialized view (empty frame before the first commit). */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    VersionedView(spark, viewDir).read().getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ViewSchema))

  /** Apply one micro-batch: skip if already committed (replay), else merge
    * and commit a new version. Public so tests can drive replays directly.
    */
  def applyBatch(spark: SparkSession, viewDir: String, batch: DataFrame,
                 batchId: Long): Unit = {
    if (batch.isEmpty) return // idle trigger: no view rewrite, no commit
    VersionedView(spark, viewDir).applyBatch(batchId) { cur =>
      val base = cur.getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ViewSchema))
      Warehouse.maintainAgg(base, batch)
        .select(col("key"), col("cnt"), col("sum_m").cast(DecimalType(38, 2)))
    }: Unit
  }

  /** Maintain the view continuously from a streaming CDC frame with columns
    * (op, key, measure).
    */
  def maintainStream(changes: DataFrame, viewDir: String,
                     checkpointDir: String): StreamingQuery = {
    val spark = changes.sparkSession
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, viewDir, batch, batchId)
      }
      .start()
  }
}
