package graft.streaming

import graft.operators.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}
import org.apache.hadoop.fs.Path

/** Streaming incremental view maintenance: a CDC stream of
  * (op ∈ I/D, key, measure) rows maintains a materialized per-key aggregate
  * (count + additive sum) through `foreachBatch` — the always-on form of
  * [[graft.operators.Warehouse.maintainAgg]], exactly as
  * [[StreamingReplication]] is the always-on form of the batch replication
  * cycle (reference context: the cron loop in
  * `/root/reference/README.md:64-90`).
  *
  * Exactly-once effect = Spark's checkpointed offsets (at-least-once
  * micro-batch delivery) × an idempotent, versioned view commit: each batch
  * writes the NEW view under `view_v<batchId>` and then atomically swaps a
  * one-line pointer file ([[graft.util.AtomicPointer]]: temp + OVERWRITE
  * rename, shared with the replication watermark) recording
  * (batchId, version). A replayed batch (crash between
  * data write and pointer swap, or a restarted query re-delivering the last
  * batch) sees `batchId <= committed` and re-derives from the PREVIOUS
  * version — never applying a delta twice.
  *
  * 100 TB shape: per trigger, cost ∝ micro-batch delta (map-side-combined
  * signed aggregate) + one full-outer merge against the current view, same
  * as the batch operator; the versioned-directory swap is the same
  * pattern the replication plane uses for partition swaps. Old versions are
  * pruned immediately after commit (keep-two: current + previous).
  */
object ViewMaintenance {

  val ViewSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("cnt", LongType),
    StructField("sum_m", DecimalType(38, 2))))

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (committedBatchId, version) from the pointer file; None before the
    * first commit. The pointer is swapped with an atomic OVERWRITE rename
    * ([[graft.util.AtomicPointer]]) — there is no crash instant at which it
    * does not exist, so a restart can never silently reset the view.
    */
  def committed(spark: SparkSession, viewDir: String): Option[(Long, Long)] =
    graft.util.AtomicPointer.read(spark.sparkContext.hadoopConfiguration,
        new Path(viewDir, "CURRENT"))
      .map { s => val Array(b, v) = s.split(","); (b.toLong, v.toLong) }

  private def readVersion(spark: SparkSession, viewDir: String,
                          cur: Option[(Long, Long)]): DataFrame = cur match {
    case Some((_, v)) => spark.read.parquet(s"$viewDir/view_v$v")
    case None => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ViewSchema)
  }

  /** The current materialized view (empty frame before the first commit). */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    readVersion(spark, viewDir, committed(spark, viewDir))

  /** Apply one micro-batch: skip if already committed (replay), else merge
    * and commit a new version. Public so tests can drive replays directly.
    */
  def applyBatch(spark: SparkSession, viewDir: String, batch: DataFrame,
                 batchId: Long): Unit = {
    val cur = committed(spark, viewDir) // read ONCE per batch (pointer + view)
    if (cur.exists(_._1 >= batchId)) return // replayed batch: already applied
    val merged = Warehouse.maintainAgg(readVersion(spark, viewDir, cur), batch)
      .select(col("key"), col("cnt"), col("sum_m").cast(DecimalType(38, 2)))
    val newV = cur.map(_._2 + 1).getOrElse(0L)
    merged.write.mode("overwrite").parquet(s"$viewDir/view_v$newV")
    graft.util.AtomicPointer.commit(spark.sparkContext.hadoopConfiguration,
      new Path(viewDir, "CURRENT"), s"$batchId,$newV")
    // keep-two pruning of ALL versions <= newV-2 (not just the one this
    // commit supersedes): a crash between a past commit and its prune must
    // not leak that version forever — listing makes the cleanup
    // self-healing.
    val f = fs(spark, viewDir)
    f.globStatus(new Path(viewDir, "view_v*")).foreach { st =>
      val v = st.getPath.getName.stripPrefix("view_v")
      if (v.forall(_.isDigit) && v.toLong <= newV - 2)
        f.delete(st.getPath, true)
    }
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
