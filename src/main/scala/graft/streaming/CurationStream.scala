package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import graft.operators.Dedup.LshIndex
import graft.util.{DeltaView, VersionedView}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Always-on CURATION: the composed nightly pipeline (q110/q78's gate
  * stack) run incrementally over a stream of arriving documents
  * (doc_id, text, source), maintaining the CURATED CORPUS and its dedup
  * index as versioned views — each stage wired onto the library's
  * incremental primitive instead of its corpus-rescanning batch form.
  *
  * Per micro-batch, in order:
  *  1. per-row gates: language-id + quality score
  *     ([[TextAnalysis.langGuessExpr]]/[[TextAnalysis.qualityKeepExpr]] —
  *     map-only, truly stateless). The corpus-LM gate (q110's
  *     `lmScore`) needs corpus-wide vocabulary statistics and stays a
  *     nightly re-curation concern, exactly as its docstring says;
  *  2. in-batch exact dedup (min doc_id per text hash);
  *  3. exact gate vs the accepted corpus: anti-join on the stored text
  *     hash — the q111 path (a production deployment puts the mergeable
  *     Bloom sketch in FRONT of this join; the stored hash table IS the
  *     verify side, and the sketch only prunes probes);
  *  4. in-batch NEAR-dup dominance: the batch's LSH artifacts under the
  *     FROZEN df-cap universe ([[Dedup.lshArtifacts]]) self-pair
  *     ([[Dedup.lshPairsWithin]]) and larger ids drop (one-shot min-id
  *     dominance, the [[EmbeddingDedupStream]] rule);
  *  5. near-dup gate vs the corpus: [[Dedup.lshIndexProbe]] against the
  *     MAINTAINED set/band views — the q123 index probe, never a corpus
  *     rescan;
  *  6. domain cap: FIRST-ARRIVAL per-source admission while the source's
  *     accepted count stays ≤ capN (deterministic in-batch order by
  *     doc_id). The nightly batch cap ranks by quality ([[
  *     graft.operators.Curation.domainCap]]); an ingest cap necessarily
  *     admits by arrival — both are documented contracts, and the
  *     spec's batch reference replays arrival order;
  *  7. commit: accepted docs append to the docs view; their set/band
  *     rows append to the index views.
  *
  * The df-cap universe `ok` is a FROZEN parameter (built once from a
  * bootstrap corpus — [[Dedup.lshIndexBuild]]`.ok`), the same
  * quantizer-freeze contract as [[EmbeddingDedupStream]]'s centroids and
  * [[Dedup.lshIndexRetract]]: stored signatures are only valid under
  * their build-time universe, and corpus churn big enough to shift df
  * statistics is a nightly full rebuild.
  *
  * THREE coupled views, ONE batchId — crash-window contract: the docs
  * view commits FIRST; a crash between commits replays the batch, the
  * committed docs view no-ops, and the set/band appenders re-derive the
  * batch's accepted ids as `batch ∩ docs view` (deterministic), so every
  * interleaving converges to the same three views. Probes during first
  * processing read the set/band views at the PREVIOUS batch's state —
  * consistent, because they only ever lag within the in-flight batch.
  */

/** Fault-injection for the coupled-view crash-window spec (the
  * [[graft.repl.CrashHooks]] recipe on the streaming plane): called with
  * a window label after each of the three view commits of a curation
  * batch. Production value is a no-op; the forked victim JVM parks here
  * so the parent can SIGKILL it BETWEEN view commits and prove the
  * documented crash-window contract (replay converges to the sequential
  * reference) by test, not by argument.
  */
private[graft] object StreamCrashHooks {
  @volatile var afterViewCommit: String => Unit = _ => ()
}

object CurationStream {

  val DocsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("hash", StringType)))

  private def bandField(r: Int) = StructField(s"s$r", LongType)
  private val bandSlots = Dedup.MinHashK / Dedup.MinHashBands

  val SetsSchema: StructType = StructType(Seq(
    StructField("doc", LongType),
    StructField("shs", ArrayType(LongType))))

  val BandsSchema: StructType = StructType(
    StructField("doc", LongType) +: StructField("band", IntegerType) +:
      (0 until bandSlots).map(bandField))

  def committed(spark: SparkSession, dir: String): Option[(Long, Long)] =
    VersionedView(spark, s"$dir/docs").committed

  private def readOr(spark: SparkSession, dir: String,
                     schema: StructType): DataFrame =
    VersionedView(spark, dir).read().getOrElse(
      graft.util.Frames.empty(spark, schema))

  /** The curated corpus (doc_id, source, hash); empty before any commit. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    readOr(spark, s"$dir/docs", DocsSchema)

  private def empty(spark: SparkSession, schema: StructType): DataFrame =
    graft.util.Frames.empty(spark, schema)

  /** Stages 1+2+4's batch side, shared by both storage cores: per-row
    * gates fused into one scan pass, in-batch exact dedup, LSH artifacts
    * under the frozen universe, in-batch near-dup dominance. `e2` and
    * `sets` come back CACHED — callers release them in a finally.
    */
  private def gateBatch(ok: DataFrame, batch: DataFrame, n: Int,
                        threshold: Double)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // eager localCheckpoint: the gated batch feeds the exact-dedup
    // groupBy AND the semi-join back — one gate pass instead of two,
    // blocks self-release (per-trigger caller, the lshIndexProbe
    // convention)
    val eligible = batch.filter(
      TextAnalysis.langGuessExpr(col("text")) === "en" &&
      TextAnalysis.qualityKeepExpr(col("text"))).localCheckpoint()
    val exactKeep = Dedup.exact(eligible, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val e2 = eligible.join(exactKeep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("text"),
        md5(col("text")).as("hash")).cache()
    val art = Dedup.lshArtifacts(e2, "text", "doc_id", ok, n)
    val sets = art.sets.cache()
    // the band rows are consumed twice (in-batch pair join here, the
    // bands-view appender later) and each evaluation re-runs the MinHash
    // signature aggregate — checkpoint once, self-releasing
    val bands = art.bands.localCheckpoint()
    val inDrop = Dedup.lshPairsWithin(LshIndex(ok, sets, bands), threshold)
      .select(col("doc_b").as("drop_id")).distinct()
    val reps = e2.join(inDrop, col("doc_id") === col("drop_id"), "left_anti")
    (e2, sets, bands, reps)
  }

  /** Stages 3+5+6 given the CURRENT views: exact gate vs the corpus, the
    * q123 index probe, and the first-arrival domain cap (accepted-so-far
    * counts broadcast, in-batch admission order = doc_id, deterministic).
    * Returns only the NEWLY admitted (doc_id, source, hash) rows.
    */
  private def admit(docsV: DataFrame, index: LshIndex, reps: DataFrame,
                    capN: Long, n: Int, threshold: Double): DataFrame = {
    // EMPTY-BATCH short-circuit (delete-only triggers): with no insert
    // survivors the admission is empty by definition — skip the probe's
    // eager batch-side artifact jobs and the two full index-view folds
    // they force (reps derives from the caller's CACHED e2, so the check
    // is a cheap local scan)
    if (reps.isEmpty)
      return reps.select(col("doc_id"), col("source"), col("hash"))
    val exNew = reps
      .join(docsV.select(col("hash")), Seq("hash"), "left_anti")
      .join(docsV.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // EMPTY-INDEX short-circuit (the bootstrap leg): probing an empty
    // index keeps every batch doc by definition, but the probe's batch
    // side still pays a full shingle+MinHash pass (its bSets frame is an
    // EAGER localCheckpoint) before its candidates join the empty band
    // view — measured at a third of q155's bootstrap-leg cost. The
    // emptiness check is a limit-1 read of the band view.
    val survivors =
      if (index.bands.isEmpty) exNew
      else {
        val nearKept = Dedup.lshIndexProbe(index, exNew, "text", "doc_id",
            n, threshold)
          .filter(col("kept")).select("doc_id")
        exNew.join(nearKept, "doc_id")
      }
    val cnts = docsV.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    val rn = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id")))
    survivors.withColumn("rn", rn)
      .join(broadcast(cnts), Seq("source"), "left")
      .filter(coalesce(col("cnt"), lit(0L)) + col("rn") <= capN)
      .select(col("doc_id"), col("source"), col("hash"))
  }

  /** Accepted ids of THIS batch, re-derivable on any replay path:
    * batch ∩ docs view on (doc_id, hash) — the hash term matters: a
    * REUSED id with different content (producer bug) is rejected by the
    * docs commit, and matching on the id alone would classify it accepted
    * here and append a rejected document's set/band rows whenever the
    * original admission left no set rows.
    */
  private def acceptedOf(e2: DataFrame, docsNow: DataFrame): DataFrame =
    e2.select(col("doc_id").as("doc"), col("hash"))
      .join(docsNow.select(col("doc_id").as("doc"), col("hash")),
        Seq("doc", "hash"))
      .select(col("doc"))

  /** Apply one micro-batch of documents (doc_id, text, source): the full
    * gate stack, then three idempotent commits. Public so tests drive
    * replay/crash cases directly.
    */
  def applyBatch(spark: SparkSession, dir: String, ok: DataFrame,
                 batch: DataFrame, batchId: Long, capN: Long,
                 n: Int = 3, threshold: Double = 0.5): Unit = {
    val vvDocs = VersionedView(spark, s"$dir/docs")
    val vvSets = VersionedView(spark, s"$dir/sets")
    val vvBands = VersionedView(spark, s"$dir/bands")
    // fail loudly if the persisted views were built under a different LSH
    // configuration (band retune / hash-family change) — see bandingStamp
    Dedup.ensureBandingStamp(spark, dir, vvDocs.committed.isDefined)
    if (Seq(vvDocs, vvSets, vvBands)
        .forall(_.committed.exists(_._1 >= batchId))) return

    val (e2, sets, bands, reps) = gateBatch(ok, batch, n, threshold)
    try {
      if (e2.isEmpty) return // idle trigger: no commits
      // index state for the probe: the PREVIOUS batch's views (they only
      // lag within the in-flight batch — see the object doc)
      val index = LshIndex(ok,
        readOr(spark, s"$dir/sets", SetsSchema),
        readOr(spark, s"$dir/bands", BandsSchema))

      vvDocs.applyBatch(batchId) { cur =>
        val docsV = cur.getOrElse(empty(spark, DocsSchema))
        docsV.unionByName(admit(docsV, index, reps, capN, n, threshold))
      }

      // checkpointed once: both appenders consume it, each evaluation
      // would re-join the batch against the docs view
      val accepted = acceptedOf(e2, readDocs(spark, dir)).localCheckpoint()
      vvSets.applyBatch(batchId) { cur =>
        val v = cur.getOrElse(empty(spark, SetsSchema))
        v.unionByName(sets.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"))
      }
      vvBands.applyBatch(batchId) { cur =>
        val v = cur.getOrElse(empty(spark, BandsSchema))
        v.unionByName(bands.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"))
      }: Unit
    } finally { e2.unpersist(); sets.unpersist() }
  }

  private def dvDocs(spark: SparkSession, dir: String, k: Int) =
    DeltaView(spark, s"$dir/docs", Seq("doc_id"), compactEvery = k)
  private def dvSets(spark: SparkSession, dir: String, k: Int) =
    DeltaView(spark, s"$dir/sets", Seq("doc"), compactEvery = k)
  private def dvBands(spark: SparkSession, dir: String, k: Int) =
    DeltaView(spark, s"$dir/bands", Seq("doc"), compactEvery = k)

  /** The curated corpus under the DELTA core. */
  def readDocsDelta(spark: SparkSession, dir: String): DataFrame =
    dvDocs(spark, dir, 8).read().getOrElse(empty(spark, DocsSchema))

  def committedDelta(spark: SparkSession,
                     dir: String): Option[(Long, Long, Long)] =
    dvDocs(spark, dir, 8).committed

  /** [[applyBatch]] on the [[DeltaView]] core: identical gate stack and
    * admission semantics, but each of the three commits ships only the
    * batch's ACCEPTED rows — O(batch), not O(corpus) — with periodic
    * compaction. The curation stream never retracts (documents leave via
    * the nightly re-curation, reference `TODO.md`-style retention is the
    * index-retract path q150/q151), so the deltas are pure appends and
    * the tombstone anti-join in the fold is empty.
    */
  def applyBatchDelta(spark: SparkSession, dir: String, ok: DataFrame,
                      batch: DataFrame, batchId: Long, capN: Long,
                      n: Int = 3, threshold: Double = 0.5,
                      compactEvery: Int = 8): Unit = {
    val (vDocs, vSets, vBands) = (dvDocs(spark, dir, compactEvery),
      dvSets(spark, dir, compactEvery), dvBands(spark, dir, compactEvery))
    Dedup.ensureBandingStamp(spark, dir, vDocs.committed.isDefined)
    if (Seq(vDocs.committed, vSets.committed, vBands.committed)
        .forall(_.exists(_._1 >= batchId))) return

    val (e2, sets, bands, reps) = gateBatch(ok, batch, n, threshold)
    val noDel = empty(spark, StructType(Seq(StructField("doc", LongType))))
    try {
      if (e2.isEmpty) return // idle trigger: no commits
      val index = LshIndex(ok,
        vSets.read().getOrElse(empty(spark, SetsSchema)),
        vBands.read().getOrElse(empty(spark, BandsSchema)))

      vDocs.applyBatch(batchId) { cur =>
        val docsV = cur.getOrElse(empty(spark, DocsSchema))
        (admit(docsV, index, reps, capN, n, threshold),
         noDel.withColumnRenamed("doc", "doc_id"))
      }

      val accepted = acceptedOf(e2, readDocsDelta(spark, dir))
        .localCheckpoint() // consumed by both appenders
      vSets.applyBatch(batchId) { cur =>
        val v = cur.getOrElse(empty(spark, SetsSchema))
        (sets.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"), noDel)
      }
      vBands.applyBatch(batchId) { cur =>
        val v = cur.getOrElse(empty(spark, BandsSchema))
        (bands.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"), noDel)
      }: Unit
    } finally { e2.unpersist(); sets.unpersist() }
  }

  /** SIGNED ingest on the [[DeltaView]] core: rows carry `op` ∈ I/D —
    * I rows (doc_id, text, source) run the full gate stack, D rows
    * (doc_id; text/source ignored) RETRACT documents from all three views
    * (takedown/retention — the [[MediaDedupStream.applySignedBatchDelta]]
    * pattern brought to the curation corpus, completing q150/q151's
    * retraction lifecycle for the STREAMED text index).
    *
    * Deletes apply FIRST: this batch's inserts gate against the
    * post-delete state (exact/near probes and the domain cap all read
    * `current view − batch deletes`), so a near-copy of a document
    * deleted in the SAME batch re-enters — and a REPLAYED delete is a
    * no-op tombstone. The df-cap universe `ok` stays FROZEN across
    * retractions ([[Dedup.lshIndexRetract]]'s contract): surviving
    * signatures remain valid, and a retracted doc provably never again
    * matches a probe (its set/band rows are tombstoned in the same
    * commit).
    *
    * Crash-window convergence is [[applyBatchDelta]]'s unchanged: docs
    * commits first; replays re-derive accepted ids as `batch ∩ docs
    * view` and re-ship the same delete keys, so every interleaving
    * converges to the same three views.
    */
  def applySignedBatchDelta(spark: SparkSession, dir: String, ok: DataFrame,
                            batch: DataFrame, batchId: Long, capN: Long,
                            n: Int = 3, threshold: Double = 0.5,
                            compactEvery: Int = 8): Unit = {
    val (vDocs, vSets, vBands) = (dvDocs(spark, dir, compactEvery),
      dvSets(spark, dir, compactEvery), dvBands(spark, dir, compactEvery))
    Dedup.ensureBandingStamp(spark, dir, vDocs.committed.isDefined)
    if (Seq(vDocs.committed, vSets.committed, vBands.committed)
        .forall(_.exists(_._1 >= batchId))) return

    val dels = batch.filter(col("op") === "D")
      .select(col("doc_id")).distinct().cache()
    val (e2, sets, bands, reps) = gateBatch(ok,
      batch.filter(col("op") === "I").select("doc_id", "text", "source"),
      n, threshold)
    try {
      if (e2.isEmpty && dels.isEmpty) return // idle trigger: no commits
      def minus(df: DataFrame, key: String) =
        df.join(broadcast(dels.select(col("doc_id").as("_del"))),
          col(key) === col("_del"), "left_anti")
      // probes and the cap read the POST-DELETE state
      val index = LshIndex(ok,
        minus(vSets.read().getOrElse(empty(spark, SetsSchema)), "doc"),
        minus(vBands.read().getOrElse(empty(spark, BandsSchema)), "doc"))

      vDocs.applyBatch(batchId) { cur =>
        val docsV = minus(cur.getOrElse(empty(spark, DocsSchema)), "doc_id")
        (admit(docsV, index, reps, capN, n, threshold), dels)
      }
      StreamCrashHooks.afterViewCommit("docs")

      val accepted = acceptedOf(e2, readDocsDelta(spark, dir))
        .localCheckpoint() // consumed by both appenders
      val delDocs = dels.withColumnRenamed("doc_id", "doc")
      // the re-insert guard reads the POST-DELETE view: a doc id deleted
      // and re-admitted in THIS batch must get fresh set/band rows (the
      // pre-delete view still holds its dying rows and would veto them)
      vSets.applyBatch(batchId) { cur =>
        val v = minus(cur.getOrElse(empty(spark, SetsSchema)), "doc")
        (sets.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"), delDocs)
      }
      StreamCrashHooks.afterViewCommit("sets")
      vBands.applyBatch(batchId) { cur =>
        val v = minus(cur.getOrElse(empty(spark, BandsSchema)), "doc")
        (bands.join(accepted, "doc")
          .join(v.select(col("doc")), Seq("doc"), "left_anti"), delDocs)
      }: Unit
    } finally { e2.unpersist(); sets.unpersist(); dels.unpersist() }
  }

  /** [[curationStreamDelta]] for a SIGNED document stream
    * (op, doc_id, text, source) — admission plus takedown.
    */
  def signedCurationStreamDelta(docs: DataFrame, ok: DataFrame, dir: String,
                                checkpointDir: String, capN: Long,
                                n: Int = 3, threshold: Double = 0.5,
                                compactEvery: Int = 8): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applySignedBatchDelta(spark, dir, ok, batch, batchId, capN, n,
          threshold, compactEvery)
      }
      .start()
  }

  /** Maintain the curated corpus continuously from a streaming document
    * frame with columns (doc_id, text, source).
    */
  def curationStream(docs: DataFrame, ok: DataFrame, dir: String,
                     checkpointDir: String, capN: Long,
                     n: Int = 3, threshold: Double = 0.5): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // no clearCache here: applyBatch releases its own caches in a
        // finally and lshIndexProbe's batch sets self-release
        // (localCheckpoint) — a session-wide clearCache would evict the
        // CALLER-owned frozen `ok` universe every trigger
        applyBatch(spark, dir, ok, batch, batchId, capN, n, threshold)
      }
      .start()
  }

  /** [[curationStream]] on the [[DeltaView]] core — O(batch) commits with
    * periodic compaction; same admission semantics, same exactly-once
    * effect.
    */
  def curationStreamDelta(docs: DataFrame, ok: DataFrame, dir: String,
                          checkpointDir: String, capN: Long,
                          n: Int = 3, threshold: Double = 0.5,
                          compactEvery: Int = 8): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchDelta(spark, dir, ok, batch, batchId, capN, n, threshold,
          compactEvery)
      }
      .start()
  }
}
