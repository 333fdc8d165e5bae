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
  * Cost model, honestly: per trigger the in-batch cluster stage is
  * batch-sized and the probe is batch-driven, but the probe SCANS the
  * current index's band rows and the commit REWRITES the index as a full
  * snapshot (the [[VersionedView]] contract) — both O(index), at 4 longs
  * per accepted clip, so the per-item constant is tiny but trigger time
  * does grow with the accepted corpus. At serving scale the production
  * layout is the q91/q144 one: persist the index BUCKETED BY BAND KEY so
  * the probe prunes to the batch's buckets, and append delta versions
  * instead of snapshot rewrites; this maintainer keeps the simple
  * snapshot contract that every streamed view here shares, and the
  * docstring states the real cost rather than claiming ∝ batch.
  *
  * Caching: the maintainer assumes it OWNS its session's cache (the
  * production norm for a dedicated always-on job) — each trigger's
  * intermediate caches (its own and its operators') are dropped with
  * `clearCache` after the commit, so a long-running stream cannot
  * accumulate stale cached plans across thousands of micro-batches.
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
    val vv = VersionedView(spark, indexDir)
    // replay check FIRST (one pointer read): a recovered/replayed batch
    // must not pay the isEmpty job below just to be skipped inside
    if (vv.committed.exists(_._1 >= batchId)) return
    if (batch.isEmpty) return // idle trigger: no commit
    try vv.applyBatch(batchId) { cur =>
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
    finally spark.catalog.clearCache() // this trigger's caches, see scaladoc
  }

  private val BinaryFileSchema: StructType = StructType(Seq(
    StructField("path", org.apache.spark.sql.types.StringType),
    StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    StructField("length", LongType),
    StructField("content", org.apache.spark.sql.types.BinaryType)))

  /** The WHOLE media-ingest pipeline as one always-on stream: watch a
    * directory of loose audio objects (the bucket layout
    * [[graft.sources.Files.readBinaryFiles]] reads in batch), fingerprint
    * each arriving file, and maintain the dedup index — files land on
    * disk, duplicates never enter the index. The media id comes from the
    * file name (`..._<id>.wav`, the bucket convention); `pathGlobFilter`
    * keeps sidecar objects out of the source itself. Checkpointed file
    * offsets + the idempotent versioned commit give the same exactly-once
    * contract as [[dedupStream]].
    */
  def ingestFiles(spark: SparkSession, watchDir: String, glob: String,
                  indexDir: String, checkpointDir: String,
                  maxDist: Int = 3): StreamingQuery = {
    val raw = spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(watchDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val media = batch.select(
          regexp_extract(col("path"), "_(\\d+)\\.[a-z]+$", 1)
            .cast("long").as("media_id"),
          lit("audio").as("kind"), col("content").as("payload"))
        applyBatch(spark, indexDir,
          Multimodal.audioFingerprintHashes(spark, media), batchId, maxDist)
      }
      .start()
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
