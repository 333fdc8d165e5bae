package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, plus the operators a training-data pipeline runs
  * over them — decode, feature-extract, resize, frame-sample.
  *
  * Decode status by kind: IMAGE, AUDIO and VIDEO all decode REAL payloads
  * — PNG via `javax.imageio` ([[ImageCodec]], q36), WAV PCM via
  * `javax.sound.sampled` ([[AudioCodec]], q61), and video via GRFV
  * container demux + per-frame `javax.imageio` decode ([[VideoCodec]],
  * q70; the container is bespoke because the JDK ships no video codec,
  * but every frame is a genuine PNG). All payloads are deterministic
  * generated media whose decoded features have closed-form SQL oracles
  * (the formats are lossless, so decode recovers the exact source data).
  * [[FakeCodec]] (md5-seeded) remains only as the documented baseline for
  * opaque binaries with no decoder, and as q36's audio/video f0 feature.
  *
  * At 100 TB the payload column dominates I/O: the pipeline projects
  * metadata-only columns wherever possible (column pruning keeps the binary
  * out of the scan for metadata-only queries) and repartitions by byte size
  * before decode so one task never gets all the 4K videos.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache (one temp file per
  // encode/decode); in-memory streams are strictly faster for these small
  // frames and avoid per-row filesystem traffic on executors.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Media table whose image rows carry REAL PNG payloads: pixel (x,y)
    * channels are linear-congruent functions of (doc_id, x, y) mod 256,
    * encoded with JDK `javax.imageio`. PNG is lossless, so a real decode
    * recovers these exact pixels — which is what makes the q36 oracle
    * possible without a decoder in DuckDB: the expected features are the
    * same closed-form pixel math aggregated in SQL. Audio/video rows keep
    * the opaque payload (the JDK has no codecs for them; md5 stub stands).
    */
  def mediaTableWithImages(docs: DataFrame): DataFrame = {
    val png = udf((d: Long) => makePng(d, imgW(d), imgH(d)))
    mediaTable(docs).withColumn("payload",
      when(col("kind") === "image", png(col("media_id"))).otherwise(col("payload")))
  }

  /** Actual (decoded) image dims — deliberately independent of the metadata
    * struct's claimed width/height, as in real corpora.
    */
  def imgW(d: Long): Int = (d % 24 + 8).toInt
  def imgH(d: Long): Int = (d % 16 + 8).toInt

  def makePng(d: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + y * 17 + d * 7) % 256).toInt
        val g = ((x * 13 + y * 29 + d * 3) % 256).toInt
        val b = ((x * 7 + y * 11 + d) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Actual audio sample count — like [[imgW]]/[[imgH]], independent of the
    * metadata struct's claims.
    */
  def audioN(d: Long): Int = (d % 400 + 100).toInt

  // --------------------------------------------------------------- video

  /** Actual video frame count / frame dims — independent of metadata. */
  def vidFrames(d: Long): Int = (d % 4 + 2).toInt
  def vidW(d: Long): Int = (d % 12 + 8).toInt
  def vidH(d: Long): Int = (d % 10 + 8).toInt

  /** Deterministic video payload in a minimal MJPEG-style container
    * ("GRFV" magic, int32 frame count, then length-prefixed REAL PNG
    * frames): frame f's pixel (x,y) channels are linear-congruent
    * functions of (d, f, x, y) mod 256. Every frame is a genuine PNG the
    * JDK can decode, so the video path exercises real container parsing
    * plus real per-frame image decode — the same closed-form-oracle trick
    * as [[makePng]]/[[makeWav]], extended with a frame axis. (The
    * container itself is bespoke because no standard video codec ships
    * with the JDK; the frame payloads are not.)
    */
  def makeVideo(d: Long): Array[Byte] = {
    val (nf, w, h) = (vidFrames(d), vidW(d), vidH(d))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GRFV")
    out.writeInt(nf)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 31 + y * 17 + d * 7 + f * 23) % 256).toInt
          val g = ((x * 13 + y * 29 + d * 3 + f * 19) % 256).toInt
          val b = ((x * 7 + y * 11 + d + f * 5) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", fb)
      val bytes = fb.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV (8 kHz): sample i of doc d is the
    * closed form `((i*37 + d*11) mod 2001) - 1000`, encoded through the
    * JDK's `javax.sound.sampled` writer. WAV PCM is lossless, so a real
    * decode recovers the exact samples — the same oracle trick as
    * [[makePng]], applied to audio.
    */
  def makeWav(d: Long, n: Int): Array[Byte] = {
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((i * 37 + d * 11) % 2001 - 1000).toInt
      samples(i * 2) = (v & 0xff).toByte
      samples(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode through `javax.sound.sampled`: sample rate, frame
    * count, and RMS amplitude. The squared-sample sum accumulates in Long
    * (exact), so the RMS is one double division + sqrt — bit-identical to
    * the oracle's integer aggregation.
    */
  final class AudioCodec {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val rate = ais.getFormat.getSampleRate.toInt
      val samples = Multimodal.pcm16(ais.readAllBytes())
      ais.close()
      val n = samples.length
      var ss = 0L
      var i = 0
      while (i < n) { ss += samples(i).toLong * samples(i); i += 1 }
      (rate, n, math.sqrt(ss.toDouble / n))
    }
  }

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Int, rms: Double)

  /** Batch decode of audio rows — once-per-partition [[AudioCodec]]. */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val codec = new AudioCodec
        it.map { m =>
          val (rate, n, rms) = codec.decode(m.payload)
          AudioFeatures(m.media_id, rate, n, rms)
        }
      }.toDF()
  }

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

  /** REAL video decode: parses the GRFV container and runs every frame
    * through `javax.imageio` — container demux + per-frame pixel decode,
    * the actual work a video feature-extraction pass does (modulo the
    * bespoke container). One codec per partition, one output row per frame.
    */
  final class VideoCodec {
    private val img = new ImageCodec
    def decode(payload: Array[Byte]): Seq[(Int, Int, Int, Double, Double, Double)] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(new String(magic, "US-ASCII") == "GRFV", "bad video magic")
      val nf = in.readInt()
      (0 until nf).map { f =>
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val (w, h, r, g, b) = img.decode(bytes)
        (f, w, h, r, g, b)
      }
    }
  }

  final case class VideoFrameFeatures(media_id: Long, frame_idx: Int,
                                      fr_w: Int, fr_h: Int,
                                      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Batch decode of video rows — once-per-partition [[VideoCodec]],
    * flatMap: one row per decoded frame.
    */
  def decodeVideo(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val codec = new VideoCodec
        it.flatMap { m =>
          codec.decode(m.payload).map { case (f, w, h, r, g, b) =>
            VideoFrameFeatures(m.media_id, f, w, h, r, g, b)
          }
        }
      }.toDF()
  }

  final case class ImageFeatures(media_id: Long, img_w: Int, img_h: Int,
                                 mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image decode through JDK `javax.imageio` (PNG/BMP/JPEG readers
    * ship with the JDK — no new dependency): width/height + per-channel
    * means. Channel sums accumulate in Long (exact), so the mean is one
    * double division — bit-identical to the oracle's integer-avg.
    */
  final class ImageCodec {
    // executors construct codecs without touching the Multimodal object,
    // so repeat the (idempotent) cache opt-out here
    javax.imageio.ImageIO.setUseCache(false)
    def decode(payload: Array[Byte]): (Int, Int, Double, Double, Double) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      (w, h, sr / n, sg / n, sb / n)
    }
  }

  final case class SafeImageFeatures(media_id: Long, decode_ok: Boolean,
                                     img_w: Option[Int], img_h: Option[Int],
                                     mean_r: Option[Double], mean_g: Option[Double],
                                     mean_b: Option[Double])

  /** Corrupt-tolerant batch decode: a payload the codec rejects yields a
    * `decode_ok = false` row with null features instead of failing the
    * task. At 100 TB some fraction of a crawled corpus IS corrupt, and a
    * codec exception that kills the stage (and, after 4 retries, the whole
    * job) is the wrong policy for one bad file; the flag keeps the failure
    * observable (count, quarantine, re-fetch) instead of silent.
    * [[decodeImages]] remains the strict form for trusted inputs.
    */
  def decodeImagesSafe(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { m =>
          try {
            val (w, h, r, g, b) = codec.decode(m.payload)
            SafeImageFeatures(m.media_id, decode_ok = true,
              Some(w), Some(h), Some(r), Some(g), Some(b))
          } catch { case _: Exception =>
            SafeImageFeatures(m.media_id, decode_ok = false,
              None, None, None, None, None)
          }
        }
      }.toDF()
  }

  /** Batch decode of image rows — the same once-per-partition codec shape
    * as [[decodeViaMapPartitions]], but with the REAL [[ImageCodec]].
    */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val codec = new ImageCodec // once per partition: codec init is the expensive part
        it.map { m =>
          val (w, h, r, g, b) = codec.decode(m.payload)
          ImageFeatures(m.media_id, w, h, r, g, b)
        }
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

  /** Shared DuckDB oracle for the index probe (q144) and its served
    * form (q147): the two queries are SPECIFIED to return the same
    * answer, so they must share one oracle — a fix to one cannot
    * silently diverge the other.
    */
  private val probeOracleSql: String = """
        WITH a AS (SELECT doc_id AS b FROM documents WHERE doc_id % 3 = 1),
        allv AS (SELECT b AS src, b AS d, 0 AS sh, 0 AS is_batch FROM a
                 UNION ALL
                 SELECT b, b + 10000, 1, 1 FROM a WHERE b % 5 = 1
                 UNION ALL
                 SELECT b + 20000, b + 20000, 0, 1 FROM a WHERE b % 5 = 2),
        s AS (SELECT d, is_batch, ((src % 400) + 100)::INT AS n, i,
                ((i*37 + src*11) % 2001 - 1000) + sh AS val
              FROM allv,
                   unnest(range(0, ((src % 400) + 100)::INT)) AS t(i)),
        g AS (SELECT d, is_batch, n, (i * 64 // n) AS f, val * val AS e
              FROM s),
        cells AS (SELECT d, is_batch, f, SUM(e) AS ef, COUNT(*) AS cf
                  FROM g GROUP BY 1, 2, 3),
        tot AS (SELECT d, is_batch, SUM(e) AS et, COUNT(*) AS ct
                FROM g GROUP BY 1, 2),
        bits AS (SELECT d, is_batch, f,
                   CASE WHEN ef * ct > et * cf THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d, is_batch)),
        bands AS (SELECT d, is_batch, f // 16 AS k,
                    CAST(SUM(bit * (1 << (f % 16))) AS BIGINT) AS v
                  FROM bits GROUP BY 1, 2, 3),
        hash4 AS (SELECT d, is_batch,
                    MAX(CASE WHEN k = 0 THEN v END) AS b0,
                    MAX(CASE WHEN k = 1 THEN v END) AS b1,
                    MAX(CASE WHEN k = 2 THEN v END) AS b2,
                    MAX(CASE WHEN k = 3 THEN v END) AS b3
                  FROM bands GROUP BY 1, 2),
        cand AS (SELECT DISTINCT bb.d AS bid, cb.d AS cid
                 FROM bands bb JOIN bands cb
                   ON bb.k = cb.k AND bb.v = cb.v
                  AND bb.is_batch = 1 AND cb.is_batch = 0),
        dup AS (SELECT bid, MIN(cid) AS dup_of
                FROM cand
                JOIN hash4 hb ON hb.d = bid AND hb.is_batch = 1
                JOIN hash4 hc ON hc.d = cid AND hc.is_batch = 0
                WHERE bit_count(xor(hb.b0, hc.b0)) + bit_count(xor(hb.b1, hc.b1))
                    + bit_count(xor(hb.b2, hc.b2)) + bit_count(xor(hb.b3, hc.b3)) <= 3
                GROUP BY bid)
        SELECT h.d AS media_id, dup.dup_of, dup.dup_of IS NULL AS kept
        FROM hash4 h LEFT JOIN dup ON dup.bid = h.d
        WHERE h.is_batch = 1
        ORDER BY media_id"""

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

    // Decode + feature extraction. Image rows run a REAL javax.imageio PNG
    // decode in the once-per-partition codec batch path; the oracle
    // recomputes the expected pixel statistics from the same closed-form
    // pixel function in SQL (PNG losslessness makes them equal). Audio /
    // video rows stay on the md5 stub (no JDK codecs exist for them).
    Query(
      "q36_media_decode_features",
      Some("""
        WITH img AS (
          SELECT doc_id AS media_id,
                 ((doc_id % 24) + 8)::INT AS w, ((doc_id % 16) + 8)::INT AS h
          FROM documents WHERE doc_id % 3 = 0),
        px AS (
          SELECT media_id, w, h, x, unnest(range(0, h)) AS y
          FROM (SELECT media_id, w, h, unnest(range(0, w)) AS x FROM img)),
        means AS (
          SELECT media_id, w, h,
                 avg((x*31 + y*17 + media_id*7) % 256) AS mr,
                 avg((x*13 + y*29 + media_id*3) % 256) AS mg,
                 avg((x*7 + y*11 + media_id) % 256) AS mb
          FROM px GROUP BY media_id, w, h)
        SELECT media_id, 'image' AS kind, NULL::DOUBLE AS f0,
               w AS img_w, h AS img_h,
               round(mr, 6) AS mean_r, round(mg, 6) AS mean_g,
               round(mb, 6) AS mean_b
        FROM means
        UNION ALL
        SELECT doc_id AS media_id,
               (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS kind,
               round((('0x' || substr(md5(text), 1, 4))::BIGINT) / 65535.0, 6) AS f0,
               NULL::INT AS img_w, NULL::INT AS img_h,
               NULL::DOUBLE AS mean_r, NULL::DOUBLE AS mean_g,
               NULL::DOUBLE AS mean_b
        FROM documents WHERE doc_id % 3 <> 0
        ORDER BY media_id"""))((spark, dir) => {
      val m = mediaTableWithImages(Tables(spark, dir).documents)
      val images = decodeImages(spark, m)
        .select(col("media_id"), lit("image").as("kind"),
          lit(null).cast("double").as("f0"),
          col("img_w"), col("img_h"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
      val av = m.filter(col("kind") =!= "image")
        .select(col("media_id"), col("kind"),
          round(element_at(fakeDecodeFeatures(col("payload")), 1), 6).as("f0"),
          lit(null).cast("int").as("img_w"), lit(null).cast("int").as("img_h"),
          lit(null).cast("double").as("mean_r"),
          lit(null).cast("double").as("mean_g"),
          lit(null).cast("double").as("mean_b"))
      images.unionByName(av).orderBy(col("media_id"))
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

    // REAL audio decode: WAV payloads (deterministic PCM) through the
    // once-per-partition javax.sound codec; oracle recomputes the sample
    // closed form and its RMS in SQL.
    Query(
      "q61_media_audio_decode",
      Some("""
        WITH a AS (SELECT doc_id AS media_id, ((doc_id % 400) + 100)::INT AS n
                   FROM documents WHERE doc_id % 3 = 1),
        s AS (SELECT media_id, n, unnest(range(0, n)) AS i FROM a),
        v AS (SELECT media_id, n, (i*37 + media_id*11) % 2001 - 1000 AS val FROM s)
        SELECT media_id, 8000 AS sample_rate, n AS n_samples,
               round(sqrt(SUM(val*val) * 1.0 / n), 6) AS rms
        FROM v GROUP BY media_id, n
        ORDER BY media_id"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      val m = mediaTable(docs).filter(col("kind") === "audio")
        .withColumn("payload", wav(col("media_id")))
      decodeAudio(spark, m)
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          round(col("rms"), 6).as("rms"))
        .orderBy(col("media_id"))
    }),

    // REAL video decode: GRFV container demux + per-frame javax.imageio
    // PNG decode in the once-per-partition codec path; the oracle
    // recomputes each frame's closed-form pixel means in SQL (PNG
    // losslessness makes them equal). One row per (video, frame).
    Query(
      "q70_media_video_decode",
      Some("""
        WITH v AS (
          SELECT doc_id AS media_id, ((doc_id % 4) + 2)::INT AS nf,
                 ((doc_id % 12) + 8)::INT AS w, ((doc_id % 10) + 8)::INT AS h
          FROM documents WHERE doc_id % 3 = 2),
        fr AS (SELECT media_id, w, h, unnest(range(0, nf)) AS f FROM v),
        px AS (
          SELECT media_id, f, w, h, x, unnest(range(0, h)) AS y
          FROM (SELECT media_id, f, w, h, unnest(range(0, w)) AS x FROM fr)),
        m AS (
          SELECT media_id, f, w, h,
                 avg((x*31 + y*17 + media_id*7 + f*23) % 256) AS mr,
                 avg((x*13 + y*29 + media_id*3 + f*19) % 256) AS mg,
                 avg((x*7 + y*11 + media_id + f*5) % 256) AS mb
          FROM px GROUP BY media_id, f, w, h)
        SELECT media_id, f::INT AS frame_idx, w AS fr_w, h AS fr_h,
               round(mr, 6) AS mean_r, round(mg, 6) AS mean_g,
               round(mb, 6) AS mean_b
        FROM m ORDER BY media_id, frame_idx"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val vid = udf((d: Long) => makeVideo(d))
      val m = mediaTable(docs).filter(col("kind") === "video")
        .withColumn("payload", vid(col("media_id")))
      decodeVideo(spark, m)
        .select(col("media_id"), col("frame_idx"), col("fr_w"), col("fr_h"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy(col("media_id"), col("frame_idx"))
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
    }),

    // Image near-duplicate pairs by perceptual hash: REAL PNG decodes →
    // 8×8 aHash → banded candidate join → hamming verify. The fixture
    // plants the near-dups a byte-level dedup CANNOT see: every image
    // gets a re-encoded copy with a +1 brightness shift (clipped at 255)
    // under media_id + 10000 — different bytes, different pixels,
    // near-identical perceptual content. The oracle recomputes both
    // variants' hashes from the closed-form pixel math (PNG losslessness)
    // and must agree on every pair AND every distance.
    Query(
      "q140_image_phash",
      Some("""
        WITH base AS (SELECT doc_id AS b FROM documents WHERE doc_id % 3 = 0),
        variants AS (SELECT b, b AS d, 0 AS bright FROM base
                     UNION ALL SELECT b, b + 10000, 1 FROM base),
        g AS (SELECT d,
                CASE WHEN bright = 0 THEN
                  (x*31 + y*17 + b*7) % 256 + (x*13 + y*29 + b*3) % 256
                    + (x*7 + y*11 + b) % 256
                ELSE
                  least((x*31 + y*17 + b*7) % 256 + 1, 255)
                    + least((x*13 + y*29 + b*3) % 256 + 1, 255)
                    + least((x*7 + y*11 + b) % 256 + 1, 255)
                END AS gray,
                (y * 8 // (b % 16 + 8)) * 8 + (x * 8 // (b % 24 + 8)) AS idx
              FROM variants,
                   unnest(generate_series(0, b % 24 + 7)) AS t1(x),
                   unnest(generate_series(0, b % 16 + 7)) AS t2(y)),
        cells AS (SELECT d, idx, SUM(gray) AS s_cell, COUNT(*) AS n_cell
                  FROM g GROUP BY 1, 2),
        tot AS (SELECT d, SUM(gray) AS s_tot, COUNT(*) AS n_tot
                FROM g GROUP BY 1),
        bits AS (SELECT d, idx,
                   CASE WHEN s_cell * n_tot > s_tot * n_cell
                        THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d)),
        bands AS (SELECT d, idx // 16 AS k,
                    CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS v
                  FROM bits GROUP BY 1, 2),
        hash4 AS (SELECT d,
                    MAX(CASE WHEN k = 0 THEN v END) AS b0,
                    MAX(CASE WHEN k = 1 THEN v END) AS b1,
                    MAX(CASE WHEN k = 2 THEN v END) AS b2,
                    MAX(CASE WHEN k = 3 THEN v END) AS b3
                  FROM bands GROUP BY d),
        cand AS (SELECT DISTINCT a.d AS da, b.d AS db
                 FROM bands a JOIN bands b
                   ON a.k = b.k AND a.v = b.v AND a.d < b.d)
        SELECT da AS media_a, db AS media_b,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
                 AS BIGINT) AS dist
        FROM cand JOIN hash4 ha ON ha.d = da JOIN hash4 hb ON hb.d = db
        WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
            + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 3
        ORDER BY media_a, media_b"""))((spark, dir) => {
      // cache: the originals feed BOTH union branches (hash pass + copy
      // synthesis) — uncached, every payload would encode twice
      val originals = mediaTableWithImages(Tables(spark, dir).documents)
        .filter(col("kind") === "image")
        .select(col("media_id").cast("long"), col("kind"), col("payload"))
        .cache()
      val corpus = originals.unionByName(
        brightenedCopies(spark, originals, offset = 10000L, delta = 1))
      imagePHashPairs(spark, corpus, maxDist = 3)
        .orderBy(col("media_a"), col("media_b"))
    }),

    // Audio near-dup pairs by 64-frame energy fingerprint over REAL WAV
    // decodes — q140's modality twin, sharing the banded-hamming tail.
    // The fixture plants a +1-sample-shifted re-encode of every clip
    // (different bytes, same sound; measured dists 0–1); the oracle
    // recomputes both variants' fingerprints from the closed-form sample
    // math (WAV PCM losslessness) and must agree on every pair and
    // distance.
    Query(
      "q141_audio_fingerprint",
      Some("""
        WITH a AS (SELECT doc_id AS b, ((doc_id % 400) + 100)::INT AS n
                   FROM documents WHERE doc_id % 3 = 1),
        variants AS (SELECT b, b AS d, 0 AS sh, n FROM a
                     UNION ALL SELECT b, b + 10000, 1, n FROM a),
        s AS (SELECT d, n, i,
                ((i*37 + b*11) % 2001 - 1000) + sh AS val
              FROM variants, unnest(range(0, n)) AS t(i)),
        g AS (SELECT d, n, (i * 64 // n) AS f, val * val AS e FROM s),
        cells AS (SELECT d, f, SUM(e) AS ef, COUNT(*) AS cf
                  FROM g GROUP BY 1, 2),
        tot AS (SELECT d, SUM(e) AS et, COUNT(*) AS ct FROM g GROUP BY 1),
        bits AS (SELECT d, f,
                   CASE WHEN ef * ct > et * cf THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d)),
        bands AS (SELECT d, f // 16 AS k,
                    CAST(SUM(bit * (1 << (f % 16))) AS BIGINT) AS v
                  FROM bits GROUP BY 1, 2),
        hash4 AS (SELECT d,
                    MAX(CASE WHEN k = 0 THEN v END) AS b0,
                    MAX(CASE WHEN k = 1 THEN v END) AS b1,
                    MAX(CASE WHEN k = 2 THEN v END) AS b2,
                    MAX(CASE WHEN k = 3 THEN v END) AS b3
                  FROM bands GROUP BY d),
        cand AS (SELECT DISTINCT a2.d AS da, b2.d AS db
                 FROM bands a2 JOIN bands b2
                   ON a2.k = b2.k AND a2.v = b2.v AND a2.d < b2.d)
        SELECT da AS media_a, db AS media_b,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
                 AS BIGINT) AS dist
        FROM cand JOIN hash4 ha ON ha.d = da JOIN hash4 hb ON hb.d = db
        WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
            + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 3
        ORDER BY media_a, media_b"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      val originals = mediaTable(docs).filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
        .cache() // both union branches read the synthesized payloads
      val corpus = originals.unionByName(
        shiftedAudioCopies(spark, originals, offset = 10000L, delta = 1))
      audioFingerprintPairs(spark, corpus, maxDist = 3)
        .orderBy(col("media_a"), col("media_b"))
    }),

    // Video near-dup pairs by shared frame fingerprints — the third
    // modality of the q140/q141 family. The fixture plants a TRIMMED
    // re-container of every clip (first frame cut, surviving frame bytes
    // verbatim): whole-file hashing sees an unrelated blob, the frame
    // hashes see every surviving frame. The oracle rebuilds both
    // variants' per-frame hashes from the closed-form frame pixel math.
    Query(
      "q142_video_shingle",
      Some("""
        WITH v0 AS (SELECT doc_id AS b, (doc_id % 4 + 2)::INT AS nf,
                           (doc_id % 12 + 8)::INT AS w,
                           (doc_id % 10 + 8)::INT AS h
                    FROM documents WHERE doc_id % 3 = 2),
        variants AS (SELECT b, b AS d, 0 AS cut, nf, w, h FROM v0
                     UNION ALL SELECT b, b + 10000, 1, nf, w, h FROM v0),
        frames AS (SELECT b, d, f, w, h
                   FROM variants, unnest(generate_series(0, nf - 1)) AS t(f)
                   WHERE f >= cut),
        g AS (SELECT d, f,
                (x*31 + y*17 + b*7 + f*23) % 256
                  + (x*13 + y*29 + b*3 + f*19) % 256
                  + (x*7 + y*11 + b + f*5) % 256 AS gray,
                (y * 8 // h) * 8 + (x * 8 // w) AS idx
              FROM frames,
                   unnest(generate_series(0, w - 1)) AS t1(x),
                   unnest(generate_series(0, h - 1)) AS t2(y)),
        cells AS (SELECT d, f, idx, SUM(gray) AS s_cell, COUNT(*) AS n_cell
                  FROM g GROUP BY 1, 2, 3),
        tot AS (SELECT d, f, SUM(gray) AS s_tot, COUNT(*) AS n_tot
                FROM g GROUP BY 1, 2),
        bits AS (SELECT d, f, idx,
                   CASE WHEN s_cell * n_tot > s_tot * n_cell
                        THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d, f)),
        fh AS (SELECT d, f,
                 CAST(SUM(CASE WHEN idx // 16 = 0
                               THEN bit * (1 << (idx % 16)) ELSE 0 END)
                   AS BIGINT) AS b0,
                 CAST(SUM(CASE WHEN idx // 16 = 1
                               THEN bit * (1 << (idx % 16)) ELSE 0 END)
                   AS BIGINT) AS b1,
                 CAST(SUM(CASE WHEN idx // 16 = 2
                               THEN bit * (1 << (idx % 16)) ELSE 0 END)
                   AS BIGINT) AS b2,
                 CAST(SUM(CASE WHEN idx // 16 = 3
                               THEN bit * (1 << (idx % 16)) ELSE 0 END)
                   AS BIGINT) AS b3
               FROM bits GROUP BY 1, 2)
        SELECT a2.d AS media_a, b2.d AS media_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fh a2 JOIN fh b2
          ON a2.b0 = b2.b0 AND a2.b1 = b2.b1 AND a2.b2 = b2.b2
         AND a2.b3 = b2.b3 AND a2.d < b2.d
        GROUP BY 1, 2
        ORDER BY media_a, media_b"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val vid = udf((d: Long) => makeVideo(d))
      val originals = mediaTable(docs).filter(col("kind") === "video")
        .select(col("media_id").cast("long"), col("kind"),
          vid(col("media_id")).as("payload"))
        .cache() // both union branches read the synthesized payloads
      val corpus = originals.unionByName(
        trimmedVideoCopies(spark, originals, offset = 10000L, cut = 1))
      videoSharedFramePairs(spark, corpus)
        .orderBy(col("media_a"), col("media_b"))
    }),

    // Fingerprint dedup with CLUSTER output — the scale-correct contract
    // the three-point study demanded after q141's pair enumeration went
    // super-linear (duplicate classes grow with this corpus, so pair
    // output is quadratic BY CONTRACT). Same corpus as q141; output is
    // each clip's near-dup cluster label: identical fingerprints group,
    // distinct fingerprints link through the banded stage, components
    // close over the links.
    Query(
      "q143_audio_dedup_clusters",
      Some("""
        WITH RECURSIVE a AS (SELECT doc_id AS b, ((doc_id % 400) + 100)::INT AS n
                   FROM documents WHERE doc_id % 3 = 1),
        variants AS (SELECT b, b AS d, 0 AS sh, n FROM a
                     UNION ALL SELECT b, b + 10000, 1, n FROM a),
        s AS (SELECT d, n, i,
                ((i*37 + b*11) % 2001 - 1000) + sh AS val
              FROM variants, unnest(range(0, n)) AS t(i)),
        g AS (SELECT d, n, (i * 64 // n) AS f, val * val AS e FROM s),
        cells AS (SELECT d, f, SUM(e) AS ef, COUNT(*) AS cf
                  FROM g GROUP BY 1, 2),
        tot AS (SELECT d, SUM(e) AS et, COUNT(*) AS ct FROM g GROUP BY 1),
        bits AS (SELECT d, f,
                   CASE WHEN ef * ct > et * cf THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d)),
        bands AS (SELECT d, f // 16 AS k,
                    CAST(SUM(bit * (1 << (f % 16))) AS BIGINT) AS v
                  FROM bits GROUP BY 1, 2),
        hash4 AS (SELECT d,
                    MAX(CASE WHEN k = 0 THEN v END) AS b0,
                    MAX(CASE WHEN k = 1 THEN v END) AS b1,
                    MAX(CASE WHEN k = 2 THEN v END) AS b2,
                    MAX(CASE WHEN k = 3 THEN v END) AS b3
                  FROM bands GROUP BY d),
        grp AS (SELECT b0, b1, b2, b3, MIN(d) AS rep
                FROM hash4 GROUP BY 1, 2, 3, 4),
        members AS (SELECT h.d, g2.rep
                    FROM hash4 h JOIN grp g2 USING (b0, b1, b2, b3)),
        repfp AS (SELECT rep AS d, b0, b1, b2, b3 FROM grp),
        bands2 AS (SELECT d, 0 AS k, b0 AS v FROM repfp
                   UNION ALL SELECT d, 1, b1 FROM repfp
                   UNION ALL SELECT d, 2, b2 FROM repfp
                   UNION ALL SELECT d, 3, b3 FROM repfp),
        cand AS (SELECT DISTINCT a2.d AS da, b2.d AS db
                 FROM bands2 a2 JOIN bands2 b2
                   ON a2.k = b2.k AND a2.v = b2.v AND a2.d < b2.d),
        near AS (SELECT da, db
                 FROM cand JOIN repfp ha ON ha.d = da
                           JOIN repfp hb ON hb.d = db
                 WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                     + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 3),
        edges AS (SELECT da AS src, db AS dst FROM near
                  UNION SELECT db, da FROM near),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        cc AS (SELECT doc, least(doc, MIN(dst)) AS lbl
               FROM (SELECT src AS doc, dst FROM reach)
               GROUP BY doc)
        SELECT m.d AS media_id, COALESCE(c.lbl, m.rep) AS cluster
        FROM members m LEFT JOIN cc c ON c.doc = m.rep
        ORDER BY media_id"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      val originals = mediaTable(docs).filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
        .cache() // both union branches read the synthesized payloads
      val corpus = originals.unionByName(
        shiftedAudioCopies(spark, originals, offset = 10000L, delta = 1))
      fingerprintDedupClusters(
          audioFingerprintHashes(spark, corpus), maxDist = 3)
        .orderBy(col("media_id"))
    }),

    // Steady-state ingest probe: a batch of re-encoded copies (every 5th
    // clip, +1 shift, id + 10000) and genuinely NEW clips (fresh sounds
    // under id + 20000) probes the corpus fingerprint index — copies
    // must resolve to a corpus dup_of, novel clips must be kept (unless
    // a corpus clip genuinely shares their fingerprint — decided
    // identically by both engines).
    Query(
      "q144_media_index_probe",
      Some(probeOracleSql))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      val originals = mediaTable(docs).filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
        .cache()
      val copies = shiftedAudioCopies(spark,
        originals.filter(col("media_id") % 5 === 1), offset = 10000L,
        delta = 1)
      val novel = docs.filter(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 2)
        .select((col("doc_id") + 20000L).as("media_id"),
          lit("audio").as("kind"),
          wav(col("doc_id") + 20000L).as("payload"))
      fingerprintIndexProbe(
          audioFingerprintHashes(spark, originals),
          audioFingerprintHashes(spark, copies.unionByName(novel)),
          maxDist = 3)
        .orderBy(col("media_id"))
    }),

    // The SERVED form of q144: the same probe answered from the PERSISTED
    // band-bucketed index with the scan partition-pruned to the batch's
    // buckets (PlanSpec-gated) — same oracle, bit-identical answer.
    Query(
      "q147_media_index_serve",
      Some(probeOracleSql))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      // no cache here: unlike q144, `originals` feeds ONLY the copy
      // synthesis (the index side rebuilds inside mediaFpIndexFor)
      val originals = mediaTable(docs).filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
      val copies = shiftedAudioCopies(spark,
        originals.filter(col("media_id") % 5 === 1), offset = 10000L,
        delta = 1)
      val novel = docs.filter(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 2)
        .select((col("doc_id") + 20000L).as("media_id"),
          lit("audio").as("kind"),
          wav(col("doc_id") + 20000L).as("payload"))
      mediaIndexServe(spark, dir,
          audioFingerprintHashes(spark, copies.unionByName(novel)),
          maxDist = 3)
        .orderBy(col("media_id"))
    }),

    // The IMAGE side of the ingest probe (q144's modality twin,
    // completing the per-modality incremental matrix): a batch of
    // brightness-shifted re-encodes (every 5th image) and genuinely new
    // images probes the corpus image-fingerprint index. The oracle
    // rebuilds both sides' aHashes from the closed-form pixel math.
    Query(
      "q148_image_index_probe",
      Some("""
        WITH a AS (SELECT doc_id AS b FROM documents WHERE doc_id % 3 = 0),
        allv AS (SELECT b AS src, b AS d, 0 AS bright, 0 AS is_batch FROM a
                 UNION ALL
                 SELECT b, b + 10000, 1, 1 FROM a WHERE b % 5 = 1
                 UNION ALL
                 SELECT b + 20000, b + 20000, 0, 1 FROM a WHERE b % 5 = 2),
        g AS (SELECT d, is_batch,
                CASE WHEN bright = 0 THEN
                  (x*31 + y*17 + src*7) % 256 + (x*13 + y*29 + src*3) % 256
                    + (x*7 + y*11 + src) % 256
                ELSE
                  least((x*31 + y*17 + src*7) % 256 + 1, 255)
                    + least((x*13 + y*29 + src*3) % 256 + 1, 255)
                    + least((x*7 + y*11 + src) % 256 + 1, 255)
                END AS gray,
                (y * 8 // (src % 16 + 8)) * 8 + (x * 8 // (src % 24 + 8))
                  AS idx
              FROM allv,
                   unnest(generate_series(0, src % 24 + 7)) AS t1(x),
                   unnest(generate_series(0, src % 16 + 7)) AS t2(y)),
        cells AS (SELECT d, is_batch, idx, SUM(gray) AS s_cell,
                         COUNT(*) AS n_cell
                  FROM g GROUP BY 1, 2, 3),
        tot AS (SELECT d, is_batch, SUM(gray) AS s_tot, COUNT(*) AS n_tot
                FROM g GROUP BY 1, 2),
        bits AS (SELECT d, is_batch, idx,
                   CASE WHEN s_cell * n_tot > s_tot * n_cell
                        THEN 1 ELSE 0 END AS bit
                 FROM cells JOIN tot USING (d, is_batch)),
        bands AS (SELECT d, is_batch, idx // 16 AS k,
                    CAST(SUM(bit * (1 << (idx % 16))) AS BIGINT) AS v
                  FROM bits GROUP BY 1, 2, 3),
        hash4 AS (SELECT d, is_batch,
                    MAX(CASE WHEN k = 0 THEN v END) AS b0,
                    MAX(CASE WHEN k = 1 THEN v END) AS b1,
                    MAX(CASE WHEN k = 2 THEN v END) AS b2,
                    MAX(CASE WHEN k = 3 THEN v END) AS b3
                  FROM bands GROUP BY 1, 2),
        cand AS (SELECT DISTINCT bb.d AS bid, cb.d AS cid
                 FROM bands bb JOIN bands cb
                   ON bb.k = cb.k AND bb.v = cb.v
                  AND bb.is_batch = 1 AND cb.is_batch = 0),
        dup AS (SELECT bid, MIN(cid) AS dup_of
                FROM cand
                JOIN hash4 hb ON hb.d = bid AND hb.is_batch = 1
                JOIN hash4 hc ON hc.d = cid AND hc.is_batch = 0
                WHERE bit_count(xor(hb.b0, hc.b0)) + bit_count(xor(hb.b1, hc.b1))
                    + bit_count(xor(hb.b2, hc.b2)) + bit_count(xor(hb.b3, hc.b3)) <= 3
                GROUP BY bid)
        SELECT h.d AS media_id, dup.dup_of, dup.dup_of IS NULL AS kept
        FROM hash4 h LEFT JOIN dup ON dup.bid = h.d
        WHERE h.is_batch = 1
        ORDER BY media_id"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val originals = mediaTableWithImages(docs)
        .filter(col("kind") === "image")
        .select(col("media_id").cast("long"), col("kind"), col("payload"))
        .cache() // feeds the index side AND the copy synthesis
      val copies = brightenedCopies(spark,
        originals.filter(col("media_id") % 5 === 1), offset = 10000L,
        delta = 1)
      val png = udf((d: Long) => makePng(d, imgW(d), imgH(d)))
      val novel = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 5 === 2)
        .select((col("doc_id") + 20000L).as("media_id"),
          lit("image").as("kind"),
          png(col("doc_id") + 20000L).as("payload"))
      fingerprintIndexProbe(
          imageHashes(spark, originals),
          imageHashes(spark, copies.unionByName(novel)),
          maxDist = 3)
        .orderBy(col("media_id"))
    })
  )

  /** Test-fixture near-dup planter: a re-encoded copy of every image with
    * each channel shifted by `delta` (clipped at 255) under
    * `media_id + offset` — the "same picture, different file" class that
    * byte-level dedup misses and perceptual hashing exists to catch.
    * Decode → pixel shift → re-encode is a REAL transcode pass (the
    * resize/re-encode shape of a production media pipeline), one payload
    * scan, no shuffle.
    */
  def brightenedCopies(spark: SparkSession, media: DataFrame, offset: Long,
                       delta: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          require(img != null, "undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = math.max(0, math.min(((p >> 16) & 0xff) + delta, 255))
              val g = math.max(0, math.min(((p >> 8) & 0xff) + delta, 255))
              val b = math.max(0, math.min((p & 0xff) + delta, 255))
              out.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRow(m.media_id + offset, "image", bos.toByteArray)
        }
      }.toDF()
  }

  final case class PHashRow(media_id: Long, b0: Long, b1: Long, b2: Long,
                            b3: Long)

  /** Image near-duplicate pairs by 8×8 average-hash over REAL decoded
    * pixels: each image's PNG decodes once per partition batch
    * ([[ImageCodec]] shape), its pixels pool into an 8×8 grid of cell
    * sums, and bit(cell) = 1 iff the cell's mean gray (r+g+b) exceeds the
    * image's global mean — compared by integer CROSS-MULTIPLICATION
    * (`s_cell·N > S·n_cell`), so the hash is bit-exact on any engine with
    * no float thresholds. The 64 bits split into four 16-bit bands;
    * candidate pairs equi-join on (band index, band value) and verify
    * exact hamming ≤ `maxDist` via bit_count(xor).
    *
    * For `maxDist ≤ 3` the banding is EXACT by pigeonhole (3 flipped bits
    * cannot touch all 4 bands), so the band join loses nothing vs the
    * all-pairs scan — the [[Dedup.simhashPairs]] argument, applied to
    * pixels instead of tokens.
    *
    * 100 TB shape: decode + hash is one payload scan with per-partition
    * codec reuse and NO shuffle (64 longs of state per image, never pixel
    * rows); candidates are an equi-join on band keys (skewed flat-color
    * bands are the df-cap analogue — cap band buckets upstream if a
    * corpus is dominated by one template); the hamming verify joins the
    * hashes table (4 longs per image) twice by id, broadcast when dims
    * allow. Pixel volume never shuffles anywhere.
    */
  def imagePHashPairs(spark: SparkSession, media: DataFrame,
                      maxDist: Int): DataFrame =
    bandedHammingPairs(imageHashes(spark, media), maxDist)

  /** Per-image aHash fingerprints as (media_id, b0..b3) — the strict
    * front of the pair/probe outputs ([[audioFingerprintHashes]]' image
    * twin); an undecodable payload is an ERROR here (trusted-table
    * contract), [[imageHashesSafe]] is the ingest form.
    */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // executor-side, idempotent: in-memory streams, not temp files
        javax.imageio.ImageIO.setUseCache(false)
        it.map { m =>
          val bands = tryAHash(m.payload)
            .getOrElse(sys.error(s"undecodable image payload ${m.media_id}"))
          PHashRow(m.media_id, bands(0), bands(1), bands(2), bands(3))
        }
      }.toDF()
  }

  /** Sign of `a·b − c·d` for NON-NEGATIVE longs without overflow
    * (128-bit compare via multiplyHigh): the threshold comparison of the
    * fingerprint hashes. A plain `a*b > c*d` wraps once a long clip's
    * energy sum (or a gigapixel image's gray sum) crosses 2⁶³ and
    * silently corrupts fingerprint bits; the DuckDB oracles compute the
    * same products in 128-bit HUGEINT, so this keeps engine and oracle
    * exact over the full input range.
    */
  private def prodCompare(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(lo1, lo2)
  }

  /** Little-endian 16-bit mono PCM → samples. THE byte-to-sample decode,
    * shared by [[AudioCodec]], the audio fingerprint and the fixture
    * transcoder — a format change lands in one place or the fingerprint
    * and fixture silently diverge.
    */
  private[operators] def pcm16(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(i * 2) & 0xff) | (bytes(i * 2 + 1) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** 8×8 average-hash of one decoded image as four 16-bit bands:
    * bit(cell) = 1 iff the cell's mean gray (r+g+b) exceeds the global
    * mean, compared by integer cross-multiplication (no float
    * thresholds). Shared by the image, and per-frame video, fingerprints.
    */
  private def aHashBands(img: java.awt.image.BufferedImage): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var sTot = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        val idx = (y * 8 / h) * 8 + (x * 8 / w)
        cellSum(idx) += gray; cellN(idx) += 1; sTot += gray
        x += 1
      }
      y += 1
    }
    val nTot = w.toLong * h
    val bands = new Array[Long](4)
    var i = 0
    while (i < 64) {
      if (prodCompare(cellSum(i), nTot, sTot, cellN(i)) > 0)
        bands(i / 16) |= 1L << (i % 16)
      i += 1
    }
    bands
  }

  /** Shared banded-hamming tail for all 64-bit perceptual fingerprints
    * (image aHash, audio energy hash): `hashes` carries
    * (media_id, b0..b3) 16-bit bands; candidates equi-join on
    * (band index, band value) — EXACT by pigeonhole for `maxDist ≤ 3` —
    * then verify hamming via bit_count(xor) over the four bands.
    *
    * 100 TB shape: the band join is the LSH-band shape (hash-partitioned
    * on small keys, never the payloads); the verify joins the hashes
    * table (4 longs per item) twice by id. A corpus dominated by one
    * flat-content template concentrates one band bucket — cap band
    * buckets upstream (the shingle-df-cap analogue) if that happens.
    */
  def bandedHammingPairs(hashesRaw: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4x16 banding is only pigeonhole-exact to dist 3")
    // The hash table (5 longs per item) feeds TWO independent plan
    // branches (band candidates; hamming verify sides). Uncached, each
    // branch would re-run the upstream payload decode — the dominant
    // cost. Caching here is what makes "one payload scan" true.
    val hashes = hashesRaw.cache()
    val bands = hashes.select(col("media_id"), explode(array(
        struct(lit(0).as("k"), col("b0").as("v")),
        struct(lit(1).as("k"), col("b1").as("v")),
        struct(lit(2).as("k"), col("b2").as("v")),
        struct(lit(3).as("k"), col("b3").as("v")))).as("b"))
      .select(col("media_id"), col("b.k").as("k"), col("b.v").as("v"))
    val cand = bands.as("a").join(bands.as("c"),
        col("a.k") === col("c.k") && col("a.v") === col("c.v") &&
          col("a.media_id") < col("c.media_id"))
      .select(col("a.media_id").as("da"), col("c.media_id").as("db"))
      .distinct()
    val ha = hashes.select(col("media_id").as("da"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hashes.select(col("media_id").as("db"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val dist = bit_count(col("a0").bitwiseXOR(col("c0"))) +
      bit_count(col("a1").bitwiseXOR(col("c1"))) +
      bit_count(col("a2").bitwiseXOR(col("c2"))) +
      bit_count(col("a3").bitwiseXOR(col("c3")))
    cand.join(ha, "da").join(hb, "db")
      .withColumn("dist", dist.cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("da").as("media_a"), col("db").as("media_b"), col("dist"))
  }

  /** Audio near-duplicate pairs by 64-frame energy fingerprint over REAL
    * WAV decodes: samples split into 64 contiguous frames, bit(frame) = 1
    * iff the frame's mean energy (v²) exceeds the clip's global mean
    * energy — the same integer cross-multiplication as the image hash
    * (`e_f·n > E·c_f`), so the fingerprint is bit-exact on any engine.
    * Candidates and verification share [[bandedHammingPairs]]. This is
    * the energy-profile core of audio fingerprinting (Chromaprint-style
    * systems add a filterbank; the Spark plumbing — one payload scan,
    * constant per-clip state, banded join — is identical).
    */
  def audioFingerprintPairs(spark: SparkSession, media: DataFrame,
                            maxDist: Int): DataFrame =
    bandedHammingPairs(audioFingerprintHashes(spark, media), maxDist)

  /** Per-clip 64-frame energy fingerprints (see [[audioFingerprintPairs]])
    * as (media_id, b0..b3) — the shared front of the pair and cluster
    * outputs. */
  def audioFingerprintHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val samples = pcm16(ais.readAllBytes()); ais.close()
          val n = samples.length
          val eF = new Array[Long](64); val cF = new Array[Long](64)
          var eTot = 0L
          var i = 0
          while (i < n) {
            val v = samples(i)
            val e = v.toLong * v
            val f = (i.toLong * 64 / n).toInt
            eF(f) += e; cF(f) += 1; eTot += e
            i += 1
          }
          val bands = new Array[Long](4)
          var f = 0
          while (f < 64) {
            if (prodCompare(eF(f), n, eTot, cF(f)) > 0)
              bands(f / 16) |= 1L << (f % 16)
            f += 1
          }
          PHashRow(m.media_id, bands(0), bands(1), bands(2), bands(3))
        }
      }.toDF()
  }

  /** THE image decode+aHash step, shared by the strict batch path
    * ([[imagePHashPairs]], which refuses undecodable payloads) and the
    * corrupt-tolerant ingest path ([[imageHashesSafe]]): one body, so
    * the streaming index and the batch dedup can never silently disagree
    * on fingerprints. None ⇔ the payload does not decode.
    */
  private def tryAHash(payload: Array[Byte]): Option[Array[Long]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(aHashBands(img))
    } catch { case _: Exception => None }

  /** Corrupt-tolerant image aHash for untrusted ingest bytes — the
    * [[audioFingerprintHashesSafe]] twin: payloads ImageIO rejects are
    * SKIPPED instead of failing the batch (the poison-file contract).
    */
  def imageHashesSafe(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { m =>
          tryAHash(m.payload).map(b =>
            PHashRow(m.media_id, b(0), b(1), b(2), b(3)))
        }
      }.toDF()
  }

  /** Corrupt-tolerant variant of [[audioFingerprintHashes]] for ingest
    * paths that read UNTRUSTED bytes (a watched bucket directory):
    * payloads the WAV decoder rejects — corrupt uploads, files listed
    * mid-write — are SKIPPED instead of failing the batch. In a
    * checkpointed stream a throwing payload would replay forever (a
    * poison-file crash loop); skipping is the only always-on-safe
    * contract. Producers should write-then-rename: a partially-written
    * file skipped here is never re-listed by the file source.
    */
  def audioFingerprintHashesSafe(spark: SparkSession,
                                 media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.payload))
            val samples = pcm16(ais.readAllBytes()); ais.close()
            val n = samples.length
            if (n == 0) None
            else {
              val eF = new Array[Long](64); val cF = new Array[Long](64)
              var eTot = 0L
              var i = 0
              while (i < n) {
                val v = samples(i)
                val e = v.toLong * v
                val f = (i.toLong * 64 / n).toInt
                eF(f) += e; cF(f) += 1; eTot += e
                i += 1
              }
              val bands = new Array[Long](4)
              var f = 0
              while (f < 64) {
                if (prodCompare(eF(f), n, eTot, cF(f)) > 0)
                  bands(f / 16) |= 1L << (f % 16)
                f += 1
              }
              Some(PHashRow(m.media_id, bands(0), bands(1), bands(2),
                bands(3)))
            }
          } catch { case _: Exception => None }
        }
      }.toDF()
  }

  /** Fingerprint dedup with CLUSTER output — the scale-correct contract
    * when duplicate classes grow with the corpus. The three-point study
    * caught [[audioFingerprintPairs]] going super-linear at 30×
    * (leg 1.32) and the root cause is the OUTPUT: this corpus carries
    * duplicate classes ∝ scale, so enumerating media-level pairs is
    * Ω(n²/classes) BY CONTRACT — no join strategy fixes an output that
    * big. The dedup a pipeline actually needs is the cluster map:
    *
    *  1. group identical fingerprints (one map-side-combinable aggregate,
    *     linear) — rep = min media id per fingerprint;
    *  2. run the banded near-dup pair stage over DISTINCT fingerprints
    *     only (12 k rows where the corpus has 100 k clips at 30×);
    *  3. connected components over the rep pair graph (tiny), then the
    *     membership join carries every clip to its cluster label.
    *
    * Output: (media_id, cluster) — cluster = smallest media id reachable
    * through identical-fingerprint groups and ≤ maxDist near-dup links.
    * Cost is linear in clips + quadratic ONLY in distinct fingerprints —
    * the exact-dedup-then-near-dup layering of [[Dedup]]'s text family,
    * applied to perceptual hashes.
    */
  def fingerprintDedupClusters(hashesRaw: DataFrame, maxDist: Int): DataFrame = {
    val h = hashesRaw.cache()
    val fpCols = Seq("b0", "b1", "b2", "b3").map(col)
    val groups = h.groupBy(fpCols: _*).agg(min(col("media_id")).as("rep"))
    val members = h.join(groups, Seq("b0", "b1", "b2", "b3"))
      .select(col("media_id"), col("rep"))
    val repFps = groups.select(col("rep").as("media_id"),
      col("b0"), col("b1"), col("b2"), col("b3"))
    // dist-0 pairs cannot occur here (identical fingerprints share a
    // group), so every pair is a genuine near-link between distinct
    // fingerprints
    val near = bandedHammingPairs(repFps, maxDist)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val cc = Pipeline.connectedComponents(near)
      .select(col("doc").as("cc_rep"), col("label"))
    members.join(cc, col("rep") === col("cc_rep"), "left")
      .select(col("media_id"),
        coalesce(col("label"), col("rep")).as("cluster"))
  }

  /** Steady-state media-ingest dedup: an arriving batch's fingerprints
    * probe the CORPUS fingerprint index instead of re-pairing the corpus —
    * the perceptual-hash twin of [[Dedup.lshIndexProbe]] (q123). Each
    * batch clip reports its smallest matching corpus id within `maxDist`
    * (`dup_of`, null ⇒ `kept`). Per-batch cost is O(batch) hashing +
    * index lookups on the batch's band keys + candidate verifies — never
    * corpus-pairing. The index is 4 longs per corpus item; persisted
    * bucketed by band key, the probe join prunes to the batch's buckets
    * (the q91 partition-pruned-serving shape). Accepted clips APPEND
    * their fingerprint rows — the index is a mergeable row set.
    */
  def fingerprintIndexProbe(index: DataFrame, batch: DataFrame,
                            maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4x16 banding is only pigeonhole-exact to dist 3")
    val idx = index.cache()
    val b = batch.cache()
    def bandify(h: DataFrame, idAs: String): DataFrame =
      h.select(col("media_id").as(idAs), explode(array(
          struct(lit(0).as("k"), col("b0").as("v")),
          struct(lit(1).as("k"), col("b1").as("v")),
          struct(lit(2).as("k"), col("b2").as("v")),
          struct(lit(3).as("k"), col("b3").as("v")))).as("bd"))
        .select(col(idAs), col("bd.k").as("k"), col("bd.v").as("v"))
    val cand = bandify(idx, "cid")
      .join(broadcast(bandify(b, "bid")), Seq("k", "v"))
      .select(col("bid"), col("cid")).distinct()
    val ha = b.select(col("media_id").as("bid"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hc = idx.select(col("media_id").as("cid"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val dist = bit_count(col("a0").bitwiseXOR(col("c0"))) +
      bit_count(col("a1").bitwiseXOR(col("c1"))) +
      bit_count(col("a2").bitwiseXOR(col("c2"))) +
      bit_count(col("a3").bitwiseXOR(col("c3")))
    val dup = cand.join(broadcast(ha), "bid").join(hc, "cid")
      .filter(dist.cast("long") <= maxDist)
      .groupBy(col("bid")).agg(min(col("cid")).as("dup_of"))
    b.select(col("media_id"))
      .join(broadcast(dup), col("media_id") === col("bid"), "left")
      .select(col("media_id"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
  }

  /** Persisted band-bucketed fingerprint index + partition-pruned probe —
    * the serving-tier layout [[fingerprintIndexProbe]]'s docstring names:
    * band rows (one per fingerprint per band, carrying the full hash)
    * written ONCE as a parquet table partitioned by `pk = band·64 + v%64`
    * (256 partitions), so a probe reads ONLY the batch's band buckets:
    * the batch's distinct pk values are control-plane sized and prune the
    * scan STATICALLY (`PartitionFilters: pk IN (…)`, gated in PlanSpec) —
    * the q91 ANN-serving shape applied to perceptual hashes. Serving cost
    * is O(probed buckets), not O(index).
    *
    * Same per-JVM memoized temp-dir contract as the IVF index: rebuilds
    * within a JVM are memoized, concurrent JVMs never clobber each other.
    */
  private def bandRows(hashes: DataFrame, idAs: String): DataFrame =
    hashes.select(col("media_id").as(idAs), col("b0"), col("b1"),
        col("b2"), col("b3"),
        explode(array(
          struct(lit(0).as("k"), col("b0").as("v")),
          struct(lit(1).as("k"), col("b1").as("v")),
          struct(lit(2).as("k"), col("b2").as("v")),
          struct(lit(3).as("k"), col("b3").as("v")))).as("bd"))
      .select(col(idAs), col("b0"), col("b1"), col("b2"), col("b3"),
        col("bd.k").as("k"), col("bd.v").as("v"),
        (col("bd.k") * 64 + pmod(col("bd.v"), lit(64L))).cast("int").as("pk"))

  def mediaFpIndexFor(spark: SparkSession, sfDir: String): String =
    graft.PartitionedWrites.memoizedIndex(s"fp#$sfDir") { path =>
      val docs = Tables(spark, sfDir).documents
      val wav = udf((d: Long) => makeWav(d, audioN(d)))
      val originals = mediaTable(docs).filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
      val bands = bandRows(
        audioFingerprintHashes(spark, originals), "media_id")
      graft.PartitionedWrites.cluster(bands, "pk")
        .write.mode("overwrite").partitionBy("pk").parquet(path)
    }

  /** Probe the PERSISTED index with a batch of fingerprints: identical
    * answer to [[fingerprintIndexProbe]] over the same corpus, but the
    * index scan is partition-pruned to the batch's band buckets.
    */
  /** NOTE on caching: the serve path holds NO internal caches — a
    * serving loop calling it per batch must not accumulate pinned frames
    * (the leak class two review rounds removed elsewhere). The batch
    * subtree evaluates at most three times (driver pk collect, candidate
    * join, output ids); the batch is small BY CONTRACT, and a caller
    * with an expensive batch lineage caches it upstream.
    */
  def mediaIndexServe(spark: SparkSession, sfDir: String,
                      batchHashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4x16 banding is only pigeonhole-exact to dist 3")
    val idx = spark.read.parquet(mediaFpIndexFor(spark, sfDir))
    val bBands = bandRows(batchHashes, "bid")
      .select(col("bid"), col("k"), col("v"), col("pk"),
        col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
        col("b3").as("a3"))
    // control-plane round-trip: ≤ 256 ints prune the partitioned scan
    val probedPks = bBands.select(col("pk")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val dist = bit_count(col("a0").bitwiseXOR(col("b0"))) +
      bit_count(col("a1").bitwiseXOR(col("b1"))) +
      bit_count(col("a2").bitwiseXOR(col("b2"))) +
      bit_count(col("a3").bitwiseXOR(col("b3")))
    // dedup (batch, corpus) pairs BEFORE the hamming verify — a near-dup
    // pair agrees on up to 4 bands and would otherwise verify 4× (the
    // in-memory probe's .distinct(), applied after the pruned join)
    val dup = idx.filter(col("pk").isin(probedPks: _*))
      .join(broadcast(bBands), Seq("k", "v"))
      .select(col("bid"), col("media_id"), col("a0"), col("a1"), col("a2"),
        col("a3"), col("b0"), col("b1"), col("b2"), col("b3"))
      .distinct()
      .filter(dist.cast("long") <= maxDist)
      .groupBy(col("bid")).agg(min(col("media_id")).as("dup_of"))
    batchHashes.select(col("media_id"))
      .join(broadcast(dup), col("media_id") === col("bid"), "left")
      .select(col("media_id"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
  }

  final case class FrameHashRow(media_id: Long, f: Int, b0: Long, b1: Long,
                                b2: Long, b3: Long)

  /** Video near-duplicate pairs by SHARED FRAME fingerprints: every clip's
    * frames demux (real GRFV container parse) and decode (real per-frame
    * PNG), each frame hashes to the 64-bit [[aHashBands]] fingerprint, and
    * two clips pair when any frames collide on the FULL 64-bit hash —
    * reported with the number of matching frame pairs. This is the
    * shared-scene detector of video dedup: a trimmed or re-containered
    * re-upload shares every surviving frame with its source while
    * whole-file hashing sees two unrelated blobs.
    *
    * 100 TB shape: demux+hash is one payload scan emitting 4 longs per
    * FRAME (pixels never leave the task); the pair stage is an equi-join
    * on the 64-bit hash (hash-partitioned, candidate volume ∝ genuinely
    * colliding frames) + one count aggregate. A corpus full of one static
    * frame (black slates) concentrates a hash bucket — cap frame-hash
    * buckets upstream, the df-cap analogue, before pairing.
    */
  def videoSharedFramePairs(spark: SparkSession, media: DataFrame): DataFrame = {
    // cached for the same two-branch reason as [[bandedHammingPairs]]
    val fh = videoFrameHashes(spark, media).cache()
    val a = fh.select(col("media_id").as("da"), col("b0"), col("b1"),
      col("b2"), col("b3"))
    val b = fh.select(col("media_id").as("db"), col("b0"), col("b1"),
      col("b2"), col("b3"))
    a.join(b, Seq("b0", "b1", "b2", "b3"))
      .filter(col("da") < col("db"))
      .groupBy(col("da").as("media_a"), col("db").as("media_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-frame 64-bit aHash fingerprints of every video row: demux the
    * GRFV container, decode each PNG frame, hash — one payload scan,
    * constant state per frame. */
  def videoFrameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { m =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val magic = new Array[Byte](4)
          in.readFully(magic)
          require(new String(magic, "US-ASCII") == "GRFV", "bad video magic")
          val nf = in.readInt()
          (0 until nf).map { f =>
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            require(img != null, "undecodable frame payload")
            val bands = aHashBands(img)
            FrameHashRow(m.media_id, f, bands(0), bands(1), bands(2),
              bands(3))
          }
        }
      }.toDF()
  }

  /** Test-fixture near-dup planter for video: a TRIMMED re-container of
    * every clip — the first `cut` frames dropped, the surviving frames'
    * PNG bytes copied VERBATIM into a fresh container under
    * `media_id + offset`. The "re-uploaded with the intro cut" class:
    * whole-file hashing sees an unrelated blob, frame fingerprints see
    * every surviving frame.
    */
  def trimmedVideoCopies(spark: SparkSession, media: DataFrame, offset: Long,
                         cut: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val magic = new Array[Byte](4)
          in.readFully(magic)
          require(new String(magic, "US-ASCII") == "GRFV", "bad video magic")
          val nf = in.readInt()
          val frames = (0 until nf).map { _ =>
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            bytes
          }
          val keep = frames.drop(cut)
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          out.writeBytes("GRFV")
          out.writeInt(keep.size)
          keep.foreach { fb => out.writeInt(fb.length); out.write(fb) }
          out.flush()
          MediaRow(m.media_id + offset, "video", bos.toByteArray)
        }
      }.toDF()
  }

  /** Test-fixture near-dup planter for audio (the [[brightenedCopies]]
    * twin): a re-encoded copy of every clip with each sample shifted by
    * `delta` under `media_id + offset` — same sound, different file.
    */
  def shiftedAudioCopies(spark: SparkSession, media: DataFrame, offset: Long,
                         delta: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          val samples = pcm16(ais.readAllBytes()); ais.close()
          val n = samples.length
          val out = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = math.max(Short.MinValue.toInt,
              math.min(samples(i) + delta, Short.MaxValue.toInt))
            out(i * 2) = (s & 0xff).toByte
            out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val outAis = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(outAis,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRow(m.media_id + offset, "audio", bos.toByteArray)
        }
      }.toDF()
  }
}
