package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(Tables(spark, sf("sf0.001")).documents).cache()

  test("mapPartitions batch decode matches the expression-path decode exactly") {
    val exprPath = media.select(col("media_id"),
        Multimodal.fakeDecodeFeatures(col("payload")).as("feature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val batchPath = Multimodal.decodeViaMapPartitions(spark, media)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(exprPath.keySet == batchPath.keySet)
    exprPath.foreach { case (id, f) => assert(f == batchPath(id), s"media $id") }
  }

  test("PNG roundtrip: real ImageIO decode recovers the closed-form pixel stats") {
    // Encode with makePng, decode with the real codec, compare against the
    // pixel function computed directly — proves losslessness end to end.
    val codec = new ImageCodec
    for (d <- Seq(0L, 3L, 42L, 999L)) {
      val (w, h) = (Multimodal.imgW(d), Multimodal.imgH(d))
      val (dw, dh, mr, mg, mb) = codec.decode(Multimodal.makePng(d, w, h))
      assert((dw, dh) == (w, h))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (x * 31 + y * 17 + d * 7) % 256
        sg += (x * 13 + y * 29 + d * 3) % 256
        sb += (x * 7 + y * 11 + d) % 256
      }
      val n = (w * h).toDouble
      assert(mr == sr / n && mg == sg / n && mb == sb / n, s"doc $d")
    }
  }

  test("WAV roundtrip: real javax.sound decode recovers the closed-form sample stats") {
    val codec = new AudioCodec
    for (d <- Seq(1L, 4L, 301L, 1000L)) {
      val n = Multimodal.audioN(d)
      val (rate, dn, rms) = codec.decode(Multimodal.makeWav(d, n))
      assert(rate == 8000 && dn == n)
      var ss = 0L
      for (i <- 0 until n) {
        val v = (i * 37 + d * 11) % 2001 - 1000
        ss += v * v
      }
      assert(rms == math.sqrt(ss.toDouble / n), s"doc $d")
    }
  }

  test("GRFV roundtrip: container demux + per-frame ImageIO decode recover the closed form") {
    val codec = new VideoCodec
    for (d <- Seq(2L, 5L, 47L, 998L)) {
      val (nf, w, h) = (Multimodal.vidFrames(d), Multimodal.vidW(d), Multimodal.vidH(d))
      val frames = codec.decode(Multimodal.makeVideo(d))
      assert(frames.size == nf)
      for (((fi, dw, dh, mr, mg, mb), f) <- frames.zipWithIndex) {
        assert(fi == f && dw == w && dh == h)
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          sr += (x * 31 + y * 17 + d * 7 + f * 23) % 256
          sg += (x * 13 + y * 29 + d * 3 + f * 19) % 256
          sb += (x * 7 + y * 11 + d + f * 5) % 256
        }
        val n = (w * h).toDouble
        assert(mr == sr / n && mg == sg / n && mb == sb / n, s"doc $d frame $f")
      }
    }
  }

  test("image rows of the media table decode through the batch codec path") {
    val withImages = Multimodal.mediaTableWithImages(Tables(spark, sf("sf0.001")).documents)
    val decoded = Multimodal.decodeImages(spark, withImages)
    val nImages = withImages.filter(col("kind") === "image").count()
    assert(decoded.count() == nImages && nImages > 0)
    val r = decoded.orderBy("media_id").head()
    assert(r.getInt(1) == Multimodal.imgW(r.getLong(0)))
    assert(r.getInt(2) == Multimodal.imgH(r.getLong(0)))
  }

  test("corrupt payloads flag decode_ok=false; good rows still decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val good = Multimodal.makePng(7L, 10, 10)
    val rows = Seq(
      (1L, "image", good),
      (2L, "image", good.take(20)),          // truncated PNG
      (3L, "image", "not a png".getBytes),   // garbage
      (4L, "image", Multimodal.makePng(4L, 8, 8)))
    val media = rows.toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeImagesSafe(spark, media)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    val ok = Multimodal.decodeImagesSafe(spark, media)
      .filter(col("decode_ok")).select("media_id", "img_w")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ok == Map(1L -> 10, 4L -> 8))
  }

  test("metadata-only query prunes the binary payload from the parquet scan") {
    // Write media as parquet, then check the scan schema of a metadata query.
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val df = spark.read.parquet(s"$dir/media")
      .groupBy("kind").agg(max(col("meta.width")))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("payload"), s"payload not pruned:\n$scan")
  }

  test("frame sampling emits duration/step frames per video") {
    val frames = Multimodal.sampleFrames(media, 5000)
    val counts = frames.groupBy("media_id").count()
    val expected = media.filter(col("kind") === "video")
      .select(col("media_id"), ceil(col("meta.duration_ms") / 5000.0).as("exp"))
    val bad = counts.join(expected, "media_id")
      .filter(col("count") =!= col("exp")).count()
    assert(bad == 0)
  }

  private lazy val imageRows = Multimodal
    .mediaTableWithImages(Tables(spark, sf("sf0.001")).documents)
    .filter(col("kind") === "image")
    .select(col("media_id").cast("long"), col("kind"), col("payload"))
    .cache()

  test("bandedHammingPairs refuses past its band-collision bound, naming the scale paths") {
    import spark.implicits._
    // two identical fingerprints -> candEst 4 (one per band) > bound 0
    val hashes = Seq((1L, 1L, 2L, 3L, 4L), (2L, 1L, 2L, 3L, 4L))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val ex = intercept[graft.util.ContractRefusal] {
      Multimodal.bandedHammingPairs(hashes, maxDist = 3,
        maxCandEstimate = 0L).count()
    }
    assert(ex.getMessage.contains("band-bucket candidate volume"), ex.getMessage)
    assert(ex.getMessage.contains("per-modality band-bucket index"), ex.getMessage)
  }

  test("imagePHashPairs: an exact re-encode (delta=0) pairs at distance 0") {
    val corpus = imageRows.orderBy("media_id").limit(20).unionByName(
      Multimodal.brightenedCopies(spark, imageRows.orderBy("media_id").limit(20),
        offset = 50000L, delta = 0))
    val got = Multimodal.imagePHashPairs(spark, corpus, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("media_a"),
        r.getAs[Long]("media_b"), r.getAs[Long]("dist")))
    // every original must pair with its byte-different re-encoded twin at
    // hamming 0; no cross-image pair may sneak under the threshold here
    val twins = got.filter { case (a, b, _) => b == a + 50000L }
    assert(twins.length == 20, s"${twins.length} of 20 twins found")
    assert(twins.forall(_._3 == 0L))
    assert(got.length == twins.length, s"unexpected cross pairs: ${got.toSeq}")
  }

  test("imagePHashPairs: brightness-shifted copies stay within the hamming budget") {
    val corpus = imageRows.unionByName(
      Multimodal.brightenedCopies(spark, imageRows, offset = 50000L, delta = 1))
    val got = Multimodal.imagePHashPairs(spark, corpus, maxDist = 3)
    assert(got.filter(col("media_b") === col("media_a") + 50000L).count() > 0)
    assert(got.filter(col("dist") > 3).count() == 0)
  }

  private lazy val audioRows = {
    val wav = udf((d: Long) => Multimodal.makeWav(d, Multimodal.audioN(d)))
    Multimodal.mediaTable(Tables(spark, sf("sf0.001")).documents)
      .filter(col("kind") === "audio")
      .select(col("media_id").cast("long"), col("kind"),
        wav(col("media_id")).as("payload"))
      .cache()
  }

  test("audioFingerprintPairs: an exact re-encode (delta=0) pairs at distance 0") {
    val corpus = audioRows.orderBy("media_id").limit(20).unionByName(
      Multimodal.shiftedAudioCopies(spark, audioRows.orderBy("media_id").limit(20),
        offset = 50000L, delta = 0))
    val got = Multimodal.audioFingerprintPairs(spark, corpus, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("media_a"),
        r.getAs[Long]("media_b"), r.getAs[Long]("dist")))
    val twins = got.filter { case (a, b, _) => b == a + 50000L }
    assert(twins.length == 20, s"${twins.length} of 20 twins found")
    assert(twins.forall(_._3 == 0L))
  }

  test("audioFingerprintPairs: sample-shifted copies stay within the hamming budget") {
    val corpus = audioRows.unionByName(
      Multimodal.shiftedAudioCopies(spark, audioRows, offset = 50000L,
        delta = 1))
    val got = Multimodal.audioFingerprintPairs(spark, corpus, maxDist = 3)
    assert(got.filter(col("media_b") === col("media_a") + 50000L).count() > 0)
    assert(got.filter(col("dist") > 3).count() == 0)
  }

  test("audioFingerprintPairs is partitioning-independent") {
    val corpus = audioRows.orderBy("media_id").limit(30).unionByName(
      Multimodal.shiftedAudioCopies(spark, audioRows.orderBy("media_id").limit(30),
        offset = 50000L, delta = 1))
    def run(d: org.apache.spark.sql.DataFrame) =
      Multimodal.audioFingerprintPairs(spark, d, maxDist = 3)
        .orderBy("media_a", "media_b").collect().toSeq
    val a = run(corpus)
    assert(a == run(corpus.repartition(7)) && a.nonEmpty)
  }

  private lazy val videoRows = {
    val vid = udf((d: Long) => Multimodal.makeVideo(d))
    Multimodal.mediaTable(Tables(spark, sf("sf0.001")).documents)
      .filter(col("kind") === "video")
      .select(col("media_id").cast("long"), col("kind"),
        vid(col("media_id")).as("payload"))
      .cache()
  }

  test("videoSharedFramePairs: a trimmed re-container shares exactly its surviving frames") {
    val corpus = videoRows.orderBy("media_id").limit(15).unionByName(
      Multimodal.trimmedVideoCopies(spark, videoRows.orderBy("media_id").limit(15),
        offset = 50000L, cut = 1))
    val got = Multimodal.videoSharedFramePairs(spark, corpus)
      .filter(col("media_b") === col("media_a") + 50000L)
      .collect().map(r => (r.getAs[Long]("media_a"),
        r.getAs[Long]("n_shared"))).toMap
    assert(got.size == 15, s"${got.size} of 15 twins found")
    // original has d % 4 + 2 frames; the copy drops one
    got.foreach { case (d, n) => assert(n == d % 4 + 1, s"clip $d: $n") }
  }

  test("videoSharedFramePairs: an untrimmed re-container shares every frame") {
    val corpus = videoRows.orderBy("media_id").limit(10).unionByName(
      Multimodal.trimmedVideoCopies(spark, videoRows.orderBy("media_id").limit(10),
        offset = 50000L, cut = 0))
    val got = Multimodal.videoSharedFramePairs(spark, corpus)
      .filter(col("media_b") === col("media_a") + 50000L)
      .collect().map(r => (r.getAs[Long]("media_a"),
        r.getAs[Long]("n_shared"))).toMap
    assert(got.size == 10)
    got.foreach { case (d, n) => assert(n == d % 4 + 2, s"clip $d: $n") }
  }

  test("videoSharedFramePairs is partitioning-independent") {
    val corpus = videoRows.orderBy("media_id").limit(20).unionByName(
      Multimodal.trimmedVideoCopies(spark, videoRows.orderBy("media_id").limit(20),
        offset = 50000L, cut = 1))
    def run(d: org.apache.spark.sql.DataFrame) =
      Multimodal.videoSharedFramePairs(spark, d)
        .orderBy("media_a", "media_b").collect().toSeq
    val a = run(corpus)
    assert(a == run(corpus.repartition(7)) && a.nonEmpty)
  }

  test("fingerprintDedupClusters: identical fingerprints group; near-links merge; isolates stand alone") {
    import spark.implicits._
    // fp A: ids 1,2 (identical). fp B: id 3, hamming 1 from A (near-link
    // in band 0, other bands equal). fp C: id 9, far from everything.
    val hashes = Seq(
      (1L, 5L, 7L, 9L, 11L),
      (2L, 5L, 7L, 9L, 11L),
      (3L, 4L, 7L, 9L, 11L),   // b0 differs by one bit (5^4=1)
      (9L, 1L << 15, 1L << 14, 1L << 13, 1L << 12))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val got = Multimodal.fingerprintDedupClusters(hashes, maxDist = 3)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L), got.toString)
  }

  test("fingerprintDedupClusters equals pair output + components on the audio corpus") {
    // The cluster contract must agree with the pair contract where both
    // are computable: clusters from dedupClusters == CC over the full
    // media-level pair graph (plus singletons).
    val corpus = audioRows.orderBy("media_id").limit(40).unionByName(
      Multimodal.shiftedAudioCopies(spark,
        audioRows.orderBy("media_id").limit(40), offset = 50000L, delta = 1))
    val hashes = Multimodal.audioFingerprintHashes(spark, corpus).cache()
    val viaClusters = Multimodal.fingerprintDedupClusters(hashes, maxDist = 3)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("cluster"))
      .toMap
    val pairs = Multimodal.bandedHammingPairs(hashes, maxDist = 3)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val cc = Pipeline.connectedComponents(pairs)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("label")).toMap
    val ids = hashes.select("media_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      assert(viaClusters(id) == cc.getOrElse(id, id), s"media $id")
    }
  }

  test("fingerprintIndexProbe: matches resolve to the smallest corpus id; misses are kept") {
    import spark.implicits._
    val index = Seq(
      (10L, 5L, 7L, 9L, 11L), (4L, 5L, 7L, 9L, 11L), // same fp twice
      (6L, 100L, 200L, 300L, 400L))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val batch = Seq(
      (101L, 5L, 7L, 9L, 11L),               // exact match -> dup_of 4
      (102L, 4L, 7L, 9L, 11L),               // hamming 1 -> dup_of 4
      (103L, 1L << 15, 1L << 14, 1L << 13, 1L << 12)) // nothing close
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val got = Multimodal.fingerprintIndexProbe(index, batch, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("media_id"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        r.getAs[Boolean]("kept"))).toSet
    assert(got == Set((101L, Some(4L), false), (102L, Some(4L), false),
      (103L, None, true)), got.toString)
  }

  test("fingerprintIndexProbe: every re-encoded copy resolves against the corpus index") {
    val originals = audioRows
    val copies = Multimodal.shiftedAudioCopies(spark,
      originals.orderBy("media_id").limit(10), offset = 50000L, delta = 1)
    val got = Multimodal.fingerprintIndexProbe(
      Multimodal.audioFingerprintHashes(spark, originals),
      Multimodal.audioFingerprintHashes(spark, copies), maxDist = 3)
    assert(got.count() == 10)
    assert(got.filter(col("kept")).count() == 0,
      "a planted copy escaped the index probe")
  }

  test("mediaIndexServe answers bit-identically to the in-memory probe") {
    val originals = {
      val wav = udf((d: Long) => Multimodal.makeWav(d, Multimodal.audioN(d)))
      Multimodal.mediaTable(Tables(spark, sf("sf0.001")).documents)
        .filter(col("kind") === "audio")
        .select(col("media_id").cast("long"), col("kind"),
          wav(col("media_id")).as("payload"))
    }
    val batch = Multimodal.shiftedAudioCopies(spark,
      originals.orderBy("media_id").limit(8), offset = 50000L, delta = 1)
    val bh = Multimodal.audioFingerprintHashes(spark, batch).cache()
    val served = Multimodal.mediaIndexServe(spark, sf("sf0.001"), bh, maxDist = 3)
      .orderBy("media_id").collect().toSeq
    val probed = Multimodal.fingerprintIndexProbe(
        Multimodal.audioFingerprintHashes(spark, originals), bh, maxDist = 3)
      .orderBy("media_id").collect().toSeq
    assert(served == probed && served.nonEmpty)
  }

  test("image index probe: copies resolve, novel images stay kept") {
    val originals = imageRows
    val copies = Multimodal.brightenedCopies(spark,
      originals.orderBy("media_id").limit(10), offset = 50000L, delta = 1)
    val png = udf((d: Long) => Multimodal.makePng(d,
      Multimodal.imgW(d), Multimodal.imgH(d)))
    import spark.implicits._
    // ids chosen with min closed-form hamming > 3 against the FULL
    // sf0.001 image corpus (ids ≡ mod 768 are EXACT duplicates of
    // corpus images — 900/903 collide that way and must not be used as
    // "novel")
    val novel = Seq(901L, 902L, 905L, 907L, 908L, 910L).toDF("media_id")
      .select(col("media_id"), lit("image").as("kind"),
        png(col("media_id")).as("payload"))
    val got = Multimodal.fingerprintIndexProbe(
        Multimodal.imageHashes(spark, originals),
        Multimodal.imageHashes(spark, copies.unionByName(novel)),
        maxDist = 3)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[Boolean]("kept")).toMap
    assert(got.size == 16)
    // every brightened copy (ids >= 50000) resolves to a corpus dup
    assert(got.filter(_._1 >= 50000L).values.forall(_ == false))
    // every genuinely new image stays kept
    assert(got.filter(kv => kv._1 >= 900L && kv._1 <= 910L)
      .values.forall(_ == true), got.toString)
  }

  test("imagePHashPairs is partitioning-independent") {
    val corpus = imageRows.orderBy("media_id").limit(30).unionByName(
      Multimodal.brightenedCopies(spark, imageRows.orderBy("media_id").limit(30),
        offset = 50000L, delta = 1))
    def run(d: org.apache.spark.sql.DataFrame) =
      Multimodal.imagePHashPairs(spark, d, maxDist = 3)
        .orderBy("media_a", "media_b").collect().toSeq
    val a = run(corpus)
    assert(a == run(corpus.repartition(7)) && a.nonEmpty)
  }
}
