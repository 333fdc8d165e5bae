package graft.streaming

import graft.operators.Multimodal
import graft.util.VersionedView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Always-on media-ingest dedup: a stream of per-clip FINGERPRINTS
  * (media_id, b0..b3 — produced upstream by
  * [[Multimodal.audioFingerprintHashes]] / the image-hash path, so the
  * heavy payload decode stays on the ingest executors) maintains the
  * corpus fingerprint INDEX through `foreachBatch` — the streaming form
  * of [[Multimodal.fingerprintIndexProbe]] (q144), as
  * [[ViewMaintenance]] is of the batch aggregate maintainer.
  *
  * Per micro-batch, in order:
  *  1. in-batch dedup: [[Multimodal.fingerprintDedupClusters]] over the
  *     batch's own fingerprints — near-dup clusters WITHIN the batch
  *     resolve to their smallest-id representative (two copies arriving
  *     together must not both enter the index);
  *  2. index probe: the surviving representatives probe the CURRENT
  *     index ([[Multimodal.fingerprintIndexProbe]]); matches are
  *     rejected — first arrival wins across batches;
  *  3. append: accepted fingerprints append to the index, committed as
  *     a new [[VersionedView]] version.
  *
  * Exactly-once effect = checkpointed offsets × the idempotent versioned
  * commit (atomic pointer swap, replayed batchIds no-op, crash windows
  * recover by overwrite-replay, keep-two pruning) — the same contract as
  * every other streamed maintainer on the shared core.
  *
  * 100 TB shape: per trigger, cost ∝ batch (hashing happened upstream;
  * the in-batch cluster stage is batch-sized; the probe joins the
  * batch's band keys against the index — bucketed by band key, that
  * prunes to the probed buckets, the q91 serving shape). The index is 4
  * longs per accepted clip and only ever appends.
  */
object MediaDedupStream {

  val IndexSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("b0", LongType), StructField("b1", LongType),
    StructField("b2", LongType), StructField("b3", LongType)))

  def committed(spark: SparkSession, indexDir: String): Option[(Long, Long)] =
    VersionedView(spark, indexDir).committed

  /** The current accepted-fingerprint index (empty before any commit). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    VersionedView(spark, indexDir).read().getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema))

  /** Apply one micro-batch of fingerprints: skip if already committed
    * (replay), else in-batch dedup → probe → append accepted. Public so
    * tests drive replay/crash cases directly.
    */
  def applyBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                 batchId: Long, maxDist: Int = 3): Unit = {
    if (batch.isEmpty) return // idle trigger: no commit
    VersionedView(spark, indexDir).applyBatch(batchId) { cur =>
      val index = cur.getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema))
      val hashes = batch.select(col("media_id"), col("b0"), col("b1"),
        col("b2"), col("b3")).cache()
      val reps = Multimodal.fingerprintDedupClusters(hashes, maxDist)
        .filter(col("media_id") === col("cluster")).select("media_id")
      val repHashes = hashes.join(reps, "media_id")
      val kept = Multimodal.fingerprintIndexProbe(index, repHashes, maxDist)
        .filter(col("kept")).select("media_id")
      index.unionByName(repHashes.join(kept, "media_id"))
    }: Unit
  }

  /** Maintain the index continuously from a streaming fingerprint frame
    * with columns (media_id, b0..b3).
    */
  def dedupStream(fingerprints: DataFrame, indexDir: String,
                  checkpointDir: String, maxDist: Int = 3): StreamingQuery = {
    val spark = fingerprints.sparkSession
    fingerprints.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, indexDir, batch, batchId, maxDist)
      }
      .start()
  }
}
