package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// ------- typed rows of the multimodal family, at package level so the
// Dataset encoders derive from stable (non-path-dependent) types and the
// mapPartitions closures capture nothing

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, feature: Array[Double])

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Int, rms: Double)

  final case class VideoFrameFeatures(media_id: Long, frame_idx: Int,
                                      fr_w: Int, fr_h: Int,
                                      mean_r: Double, mean_g: Double, mean_b: Double)

  final case class ImageFeatures(media_id: Long, img_w: Int, img_h: Int,
                                 mean_r: Double, mean_g: Double, mean_b: Double)

  final case class SafeImageFeatures(media_id: Long, decode_ok: Boolean,
                                     img_w: Option[Int], img_h: Option[Int],
                                     mean_r: Option[Double], mean_g: Option[Double],
                                     mean_b: Option[Double])

  final case class PHashRow(media_id: Long, b0: Long, b1: Long, b2: Long,
                            b3: Long)

  final case class FrameHashRow(media_id: Long, f: Int, b0: Long, b1: Long,
                                b2: Long, b3: Long)

/** Deterministic synthetic-media FIXTURES of the multimodal family: the
  * media table derivations, the closed-form PNG/WAV/GRFV payload
  * generators whose lossless decodes make SQL oracles possible, and the
  * near-dup copy planters (re-encode transforms). Mixed into
  * [[Multimodal]] — one public surface, three source files (fixtures /
  * codecs+operators / oracle queries), no forwarding shells.
  * Serializable: trait-method closures capture the mixed-in object.
  */
private[graft] trait MultimodalFixtures extends Serializable {
  self: MultimodalCodecs =>

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
