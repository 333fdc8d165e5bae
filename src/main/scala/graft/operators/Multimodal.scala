package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, plus the operators a training-data pipeline runs
  * over them — decode, feature-extract, resize, frame-sample.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `fakeDecode*` derive deterministic pseudo-features from the bytes (md5-
  * seeded). Everything AROUND the stub is real and tested: the schema
  * (binary + struct), the single-scan column pipeline, the partition-size
  * balancing before the expensive step, and the mapPartitions batch shape
  * with once-per-partition decoder initialization (the pattern a real codec
  * integration uses — swap `FakeCodec` for the real library and nothing
  * else changes).
  *
  * At 100 TB the payload column dominates I/O: the pipeline projects
  * metadata-only columns wherever possible (column pruning keeps the binary
  * out of the scan for metadata-only queries) and repartitions by byte size
  * before decode so one task never gets all the 4K videos.
  */
object Multimodal {

  /** Deterministic synthetic media table derived from `documents`: payload =
    * UTF-8 bytes of the text, kind cycles image/audio/video, metadata from
    * doc stats. Oracle-friendly: the same derivation is SQL-expressible.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        col("n_chars").cast("long").as("size_bytes"),
        (col("n_chars") % 1920 + 16).cast("int").as("width"),
        (col("n_chars") % 1080 + 16).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms")).as("meta"))

  /** STUB decode: pseudo image features from the payload hash — stands in
    * for a real `decode(bytes) → (width, height, channels, hist…)`.
    */
  def fakeDecodeFeatures(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5(payload)
    array((0 until 8).map { i =>
      (conv(substring(h, i * 4 + 1, 4), 16, 10).cast("double") / 65535.0)
    }: _*)
  }

  /** Metadata-only resize: recompute width/height to fit a bounding box.
    * A real implementation would also transform pixels inside the batch
    * decode; the metadata algebra (aspect-preserving fit) is the tested part.
    */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height"), lit(1.0))
    df.withColumn("resized", struct(
      floor(col("meta.width") * scale).cast("int").as("width"),
      floor(col("meta.height") * scale).cast("int").as("height")))
  }

  /** Frame sampling for video rows: one frame index every `everyMs`. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))

  // ------------------------------------------------- mapPartitions batch path

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, feature: Array[Double])

  /** The real-codec integration shape: one decoder instance per partition
    * (codec init is expensive), rows streamed through it lazily. `FakeCodec`
    * is the stub; its output matches [[fakeDecodeFeatures]] exactly, which
    * MultimodalSpec asserts — so the expression path (codegen-friendly, used
    * in queries) and the batch path (library integration) are interchangeable.
    */
  def decodeViaMapPartitions(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
    ds.mapPartitions { it =>
      val codec = new FakeCodec // once per partition, as a real codec lib requires
      it.map(m => DecodedRow(m.media_id, codec.decode(m.payload)))
    }.toDF()
  }

  /** Deterministic stand-in for a codec library (md5-seeded, matches the
    * SQL/Column path bit-for-bit).
    */
  final class FakeCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(payload: Array[Byte]): Array[Double] = {
      md.reset()
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      (0 until 8).map { i =>
        java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16).toDouble / 65535.0
      }.toArray
    }
  }

  // ------------------------------------------------------------ query corpus

  val queries: Seq[Query] = Seq(

    // Metadata-only stats per kind — binary column pruned from the scan.
    Query(
      "q35_media_meta_stats",
      Some("""
        WITH media AS (
          SELECT doc_id AS media_id,
                 (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS kind,
                 n_chars::BIGINT AS size_bytes,
                 ((n_chars % 1920) + 16)::INT AS width,
                 ((n_chars % 1080) + 16)::INT AS height,
                 (n_chars * 40)::BIGINT AS duration_ms
          FROM documents)
        SELECT kind, COUNT(*) AS n,
               CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
               MAX(width) AS max_w, MAX(height) AS max_h,
               CAST(SUM(duration_ms) AS BIGINT) AS total_ms
        FROM media GROUP BY kind ORDER BY kind"""))((spark, dir) => {
      val m = mediaTable(Tables(spark, dir).documents)
      m.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.size_bytes")).as("total_bytes"),
          max(col("meta.width")).as("max_w"),
          max(col("meta.height")).as("max_h"),
          sum(col("meta.duration_ms")).as("total_ms"))
        .orderBy(col("kind"))
    }),

    // Decode + feature extraction (stubbed decode, real pipeline shape).
    Query(
      "q36_media_decode_features",
      Some("""
        SELECT doc_id AS media_id,
               round((('0x' || substr(md5(text), 1, 4))::BIGINT) / 65535.0, 6) AS f0,
               round((('0x' || substr(md5(text), 5, 4))::BIGINT) / 65535.0, 6) AS f1,
               round((('0x' || substr(md5(text), 9, 4))::BIGINT) / 65535.0, 6) AS f2
        FROM documents ORDER BY media_id"""))((spark, dir) => {
      val m = mediaTable(Tables(spark, dir).documents)
      val f = fakeDecodeFeatures(col("payload"))
      m.select(col("media_id"),
        round(element_at(f, 1), 6).as("f0"),
        round(element_at(f, 2), 6).as("f1"),
        round(element_at(f, 3), 6).as("f2"))
        .orderBy(col("media_id"))
    }),

    // Aspect-preserving resize metadata.
    Query(
      "q37_media_resize",
      Some("""
        WITH media AS (
          SELECT doc_id AS media_id,
                 ((n_chars % 1920) + 16)::INT AS width,
                 ((n_chars % 1080) + 16)::INT AS height
          FROM documents),
        s AS (SELECT media_id, width, height,
                least(256.0 / width, 256.0 / height, 1.0) AS scale
              FROM media)
        SELECT media_id, CAST(floor(width * scale) AS INT) AS new_w,
               CAST(floor(height * scale) AS INT) AS new_h
        FROM s ORDER BY media_id"""))((spark, dir) => {
      val m = resizeMeta(mediaTable(Tables(spark, dir).documents), 256, 256)
      m.select(col("media_id"), col("resized.width").as("new_w"),
        col("resized.height").as("new_h"))
        .orderBy(col("media_id"))
    }),

    // Frame sampling: one row per sampled frame of each video.
    Query(
      "q38_media_frame_sample",
      Some("""
        WITH media AS (
          SELECT doc_id AS media_id,
                 (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS kind,
                 (n_chars * 40)::BIGINT AS duration_ms
          FROM documents)
        SELECT media_id, unnest(range(0, duration_ms, 5000)) AS frame_ts_ms
        FROM media WHERE kind = 'video'
        ORDER BY media_id, frame_ts_ms"""))((spark, dir) => {
      sampleFrames(mediaTable(Tables(spark, dir).documents), 5000)
        .orderBy(col("media_id"), col("frame_ts_ms"))
    })
  )
}
