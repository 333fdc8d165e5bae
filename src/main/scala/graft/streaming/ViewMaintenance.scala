package graft.streaming

import graft.operators.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

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
  * one-line pointer file (temp + rename, the [[graft.repl.MetadataStore]]
  * contract) recording (batchId, version). A replayed batch (crash between
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
    * first commit.
    */
  def committed(spark: SparkSession, viewDir: String): Option[(Long, Long)] = {
    val p = new Path(viewDir, "CURRENT")
    val f = fs(spark, viewDir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](128)
        val n = in.read(bytes)
        val Array(b, v) = new String(bytes, 0, n, StandardCharsets.UTF_8)
          .trim.split(",")
        Some((b.toLong, v.toLong))
      } finally in.close()
    }
  }

  /** The current materialized view (empty frame before the first commit). */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    committed(spark, viewDir) match {
      case Some((_, v)) => spark.read.parquet(s"$viewDir/view_v$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ViewSchema)
    }

  /** Apply one micro-batch: skip if already committed (replay), else merge
    * and commit a new version. Public so tests can drive replays directly.
    */
  def applyBatch(spark: SparkSession, viewDir: String, batch: DataFrame,
                 batchId: Long): Unit = {
    val cur = committed(spark, viewDir)
    if (cur.exists(_._1 >= batchId)) return // replayed batch: already applied
    val merged = Warehouse.maintainAgg(readView(spark, viewDir), batch)
      .select(col("key"), col("cnt"), col("sum_m").cast(DecimalType(38, 2)))
    val newV = cur.map(_._2 + 1).getOrElse(0L)
    merged.write.mode("overwrite").parquet(s"$viewDir/view_v$newV")
    val f = fs(spark, viewDir)
    val p = new Path(viewDir, "CURRENT")
    val tmp = new Path(viewDir, "CURRENT.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$batchId,$newV".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"view pointer swap failed at $viewDir")
    // keep-two pruning: current + previous survive; older versions go.
    if (newV >= 2) f.delete(new Path(viewDir, s"view_v${newV - 2}"), true)
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
