package graft.streaming

import graft.operators.TextAnalysis
import graft.util.{AtomicPointer, DeltaView, Frames}
import graft.util.TextPrep.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Always-on BM25 POSTINGS maintenance — the text-retrieval member of the
  * streamed-index family (embeddings [[EmbeddingDedupStream]], media
  * [[MediaDedupStream]], curated corpus [[CurationStream]]): a stream of
  * SIGNED document rows (op ∈ I/D, doc_id, text) maintains the inverted
  * postings index that [[TextAnalysis.bm25TopKServed]] serves from, as
  * two coupled [[DeltaView]]s — so retrieval keeps serving fresh
  * documents without the nightly full `bm25IndexFor` rebuild, and
  * takedowns leave the index as if the document never existed.
  *
  * State (one directory, one batchId across both views):
  *  - `docs/`     — (doc, dl, hash): one row per live document; the
  *    id-uniqueness invariant, the corpus stats source (N = count,
  *    avgdl = sum(dl)/N — both exact integers/long-sums, so identical
  *    to a from-scratch scan at any partitioning), and the replay
  *    anchor (the CurationStream `batch ∩ docs view` recipe);
  *  - `postings/` — (term, doc, dl, tf, tb): the q156 layout, keyed by
  *    `doc` (a document's postings live and die together — "modify" is
  *    delete+reinsert), compacted bases partitioned by
  *    `tb = pmod(xxhash64(term), nBuckets)` so serving scans
  *    partition-prune to the query terms' buckets.
  *
  * Per signed batch: deletes apply FIRST (tombstones by doc; inserts
  * gate against the post-delete state, so delete-then-reinsert in one
  * batch works — the [[CurationStream.applySignedBatchDelta]] contract);
  * in-batch duplicate ids keep ONE row deterministically (smallest text
  * md5 — the media maintainer's smallest-fingerprint rule); a re-used
  * live id is rejected (id uniqueness is an index invariant). The docs
  * view commits FIRST; the postings appender re-derives the batch's
  * accepted ids as `batch ∩ docs view` on (doc, hash), so a crash
  * between the two commits converges on replay (PostingsStreamSpec
  * aborts in the window via [[StreamCrashHooks]] and proves it).
  *
  * Serving ([[bm25TopKDelta]]): exactly [[TextAnalysis.bm25TopKServed]]'s
  * machinery — query-term buckets collected control-plane side with the
  * SAME xxhash64 expression the writer uses, the folded postings view
  * filtered by `tb IN (…) AND term IN (…)` (partition-pruned on the
  * compacted base; deltas are batch-sized), per-term df exact from the
  * pruned scan, stats from the docs view, the shared decimal-routed
  * scorer ([[TextAnalysis.bm25ScorePostings]]). q160 proves the whole
  * lifecycle hash-equal to a from-scratch BM25 over the surviving
  * corpus.
  *
  * The index layout is STAMPED (tokenizer family, bucket count, hash) —
  * the [[graft.operators.Dedup.bandingStamp]] recipe: a maintainer or
  * server under a different nBuckets/tokenization fails "rebuild
  * required" instead of writing to (or pruning) the wrong buckets; the
  * first commit is create-exclusive ([[AtomicPointer.commitExclusive]]),
  * so two concurrent bootstrappers with different configs cannot both
  * believe they stamped.
  *
  * 100 TB shape: a day's ingest costs the day — per-batch tokenize +
  * one groupBy over the batch's (term, doc) pairs + O(batch) delta
  * commits; the corpus-wide artifacts (compacted bases) rewrite every
  * `compactEvery` commits only. Serving touches the query terms' posting
  * lists, never the corpus.
  */
object PostingsStream {

  val DocsSchema: StructType = StructType(Seq(
    StructField("doc", LongType), StructField("dl", LongType),
    StructField("hash", StringType)))

  val PostingsSchema: StructType = StructType(Seq(
    StructField("term", StringType), StructField("doc", LongType),
    StructField("dl", LongType), StructField("tf", LongType),
    StructField("tb", IntegerType)))

  /** What a postings directory is stamped with: the tokenizer family and
    * the bucketing (count + hash). Any change invalidates stored rows
    * and every serving-side bucket computation.
    */
  def postingsStamp(nBuckets: Int): String =
    s"postings=v1,tokens=ws-lower,bucket=xxhash64%$nBuckets"

  /** Validate (or create-exclusively record) the layout stamp. */
  def ensurePostingsStamp(spark: SparkSession, dir: String, nBuckets: Int,
                          stateExists: Boolean): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir, "LAYOUT")
    val want = postingsStamp(nBuckets)
    AtomicPointer.read(conf, p) match {
      case Some(s) if s == want => ()
      case Some(s) => throw new IllegalStateException(
        s"postings-layout stamp mismatch, rebuild required: $dir was " +
        s"built under '$s' but this engine is '$want' — a tokenizer or " +
        "bucketing change makes stored postings incomparable (a " +
        "mismatched server prunes the WRONG buckets and returns wrong " +
        "emptiness)")
      case None if stateExists => throw new IllegalStateException(
        s"$dir has committed postings state but no LAYOUT stamp — built " +
        s"by a pre-stamp engine or a foreign writer; rebuild required " +
        s"(engine is '$want')")
      case None =>
        if (!AtomicPointer.commitExclusive(conf, p, want))
          AtomicPointer.read(conf, p) match {
            case Some(s) if s == want => ()
            case Some(s) => throw new IllegalStateException(
              s"postings-layout stamp race lost: $dir was concurrently " +
              s"stamped '$s' but this maintainer is '$want'")
            case None => throw new IllegalStateException(
              s"$dir/LAYOUT vanished during first commit")
          }
    }
  }

  private def dvDocs(spark: SparkSession, dir: String, k: Int) =
    DeltaView(spark, s"$dir/docs", Seq("doc"), compactEvery = k)
  private def dvPost(spark: SparkSession, dir: String, k: Int) =
    DeltaView(spark, s"$dir/postings", Seq("doc"), compactEvery = k,
      basePartitionCols = Seq("tb"))

  private def empty(spark: SparkSession, schema: StructType): DataFrame =
    Frames.empty(spark, schema)

  /** Live documents (doc, dl, hash); empty before any commit. */
  def readDocsDelta(spark: SparkSession, dir: String): DataFrame =
    dvDocs(spark, dir, 8).read().getOrElse(empty(spark, DocsSchema))
      .select(col("doc").cast("long"), col("dl").cast("long"), col("hash"))

  /** Live postings (term, doc, dl, tf, tb); empty before any commit.
    * Partition-column inference reads `tb` back as int on compacted
    * bases — pin the published schema regardless of file kind.
    */
  def readPostingsDelta(spark: SparkSession, dir: String): DataFrame =
    dvPost(spark, dir, 8).read().getOrElse(empty(spark, PostingsSchema))
      .select(col("term"), col("doc").cast("long"), col("dl").cast("long"),
        col("tf").cast("long"), col("tb").cast("int"))

  def committedDelta(spark: SparkSession,
                     dir: String): Option[(Long, Long, Long)] =
    dvDocs(spark, dir, 8).committed

  /** A batch's postings rows — the EXACT `bm25IndexFor` build expressions
    * (same tokenizer, same tf groupBy, same bucket hash), evaluated over
    * the batch instead of the corpus: a (term, doc) posting depends only
    * on its own document's text, which is what makes the maintained index
    * row-identical to a full rebuild over the live corpus.
    */
  private def postingsOf(docsWithText: DataFrame, nBuckets: Int): DataFrame =
    docsWithText.select(col("doc"), tokens(col("text")).as("tk"))
      .select(col("doc"), size(col("tk")).cast("long").as("dl"), col("tk"))
      .select(col("doc"), col("dl"), explode(col("tk")).as("term"))
      .groupBy(col("term"), col("doc"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))

  /** Apply one SIGNED micro-batch (op ∈ I/D, doc_id, text). Public so
    * tests drive replay/crash/delete cases directly.
    */
  def applySignedBatchDelta(spark: SparkSession, dir: String,
                            batch: DataFrame, batchId: Long,
                            nBuckets: Int = 64,
                            compactEvery: Int = 8): Unit = {
    val (vDocs, vPost) = (dvDocs(spark, dir, compactEvery),
      dvPost(spark, dir, compactEvery))
    ensurePostingsStamp(spark, dir, nBuckets,
      stateExists = vDocs.committed.isDefined)
    if (Seq(vDocs.committed, vPost.committed)
        .forall(_.exists(_._1 >= batchId))) return

    val dels = batch.filter(col("op") === "D")
      .select(col("doc_id").cast("long").as("doc")).distinct().cache()
    // deterministic in-batch id dedupe: smallest text-md5 wins (the media
    // maintainer's smallest-fingerprint rule — the id, not arrival order,
    // is the identity, and a duplicate-id index row would corrupt df)
    val rn = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("hash")))
    val ins = batch.filter(col("op") === "I")
      .select(col("doc_id").cast("long").as("doc"), col("text"),
        md5(col("text")).as("hash"))
      .withColumn("_rn", rn).filter(col("_rn") === 1).drop("_rn")
      .cache()
    try {
      if (ins.isEmpty && dels.isEmpty) return // idle trigger: no commits
      def minus(df: DataFrame) =
        df.join(broadcast(dels.select(col("doc").as("_del"))),
          col("doc") === col("_del"), "left_anti")

      // docs view FIRST: inserts gate against the post-delete live set
      vDocs.applyBatch(batchId) { cur =>
        val live = minus(cur.getOrElse(empty(spark, DocsSchema)))
        val acc = ins.join(live.select(col("doc")), Seq("doc"), "left_anti")
          .select(col("doc"), size(tokens(col("text"))).cast("long").as("dl"),
            col("hash"))
        (acc, dels)
      }
      StreamCrashHooks.afterViewCommit("postings-docs")

      // accepted ids re-derived from the COMMITTED docs view on
      // (doc, hash) — replay-stable, and a re-used id with different
      // content classifies rejected (the CurationStream recipe)
      val accepted = ins.join(
        readDocsDelta(spark, dir).select(col("doc"), col("hash")),
        Seq("doc", "hash"), "left_semi")
      vPost.applyBatch(batchId) { cur =>
        val v = minus(cur.getOrElse(empty(spark, PostingsSchema)))
        (postingsOf(accepted, nBuckets)
          .join(v.select(col("doc")).distinct(), Seq("doc"), "left_anti"),
         dels)
      }: Unit
    } finally { ins.unpersist(); dels.unpersist() }
  }

  /** BM25 top-k served from the MAINTAINED index — q156's serving path on
    * the streamed state: same bucket pruning, same exact df, same scorer.
    */
  def bm25TopKDelta(spark: SparkSession, dir: String,
                    queries: Seq[(Long, String)], k: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75, nSalts: Int = 16,
                    nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    ensurePostingsStamp(spark, dir, nBuckets,
      stateExists = dvDocs(spark, dir, 8).committed.isDefined)
    val allTerms = queries.flatMap(_._2.toLowerCase.trim.split(" +")).distinct
    // bucket ids via the SAME expression as the writer (driver-side
    // reimplementation would silently drift)
    val buckets = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val post = readPostingsDelta(spark, dir)
      .filter(col("tb").isin(buckets: _*) && col("term").isin(allTerms: _*))
      .select(col("term"), col("doc"), col("dl"), col("tf"))
    val stats = readDocsDelta(spark, dir)
      .agg(count(lit(1)).cast("double").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    TextAnalysis.bm25ScorePostings(post, stats, queries, k, k1, b, nSalts)
  }

  /** Maintain the postings index continuously from a streaming signed
    * frame with columns (op, doc_id, text).
    */
  def postingsStreamDelta(docs: DataFrame, dir: String,
                          checkpointDir: String, nBuckets: Int = 64,
                          compactEvery: Int = 8): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applySignedBatchDelta(spark, dir, batch, batchId, nBuckets,
          compactEvery)
      }
      .start()
  }
}
