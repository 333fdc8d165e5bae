package graft.operators

import graft.{Query, Tables}
import graft.util.TextPrep._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-mix construction — the steps that
  * sit BETWEEN per-doc scoring (TextAnalysis) / dedup (Dedup) and the final
  * training tape (Pipeline.packSequences): maximal duplicated-span merging,
  * CCNet-style quality bucketing, deterministic epoch shuffling, per-domain
  * caps, and mixture-weight token allocation.
  *
  * Scale design (100 TB):
  *  - no global windows anywhere: span merging windows per-document
  *    (bounded by doc length), epoch shuffling uses the two-level
  *    range-partition prefix scan (bounded by partition size), domain caps
  *    use a salted two-phase top-k (bounded by k × salt count);
  *  - corpus-wide statistics (quality thresholds, per-source token totals)
  *    reduce to a handful of rows and come back as broadcasts, so the
  *    classification / allocation passes stay map-side;
  *  - everything is deterministic under re-partitioning — hash coins and
  *    range-partition carries, never `rand()` or partition-order survivors.
  */
object Curation {

  // ------------------------------------------------ maximal span merging

  /** Merge the fixed-k duplicated windows of [[Dedup.duplicatedSpans]] into
    * maximal per-document removal spans — the actual cut list of ExactSubstr
    * dedup (Lee et al. 2022 §3): overlapping or touching k-token windows
    * `[pos, pos+k)` collapse to one `[start_pos, end_tok]` island via
    * gaps-and-islands (a new island starts when `pos > lag(pos) + k`).
    *
    * The window partitions by document, so its size is bounded by document
    * length — never by corpus size — and the upstream window stream is the
    * groupBy/join plan of q103 (no corpus-hot span ever concentrates into a
    * single window partition here, because islands are per-document).
    * `hashKeys` passes through to [[Dedup.duplicatedSpans]] — the merge
    * only reads `(doc_id, pos)`, so the hashed-key scale configuration
    * loses nothing here.
    */
  def mergedDuplicateSpans(docs: DataFrame, textCol: String, idCol: String,
                           k: Int = 10, minOcc: Int = 2,
                           hashKeys: Boolean = false): DataFrame = {
    val rem = Dedup.duplicatedSpans(docs, textCol, idCol, k, minOcc, hashKeys)
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    rem
      .withColumn("ni",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(w), lit(Long.MinValue / 2)) + k, 1)
          .otherwise(0))
      .withColumn("island", sum(col("ni")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit(k - 1)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("island"), col("start_pos"),
        col("end_tok"), col("n_windows"))
  }

  // ------------------------------------------------ quality bucketing

  /** CCNet-style quality bucketing (Wenzek et al. 2020 §4.3): score every
    * document against the corpus language model, split the corpus at the
    * exact 25th/75th score percentiles into head / middle / tail, and roll
    * up per (source, bucket).
    *
    * The thresholds frame is ONE row — broadcast — so the tagging pass is a
    * map-side CASE over the scored stream; the per-bucket roll-up sums
    * through DECIMAL(18,6) so the average is exact at any partition count
    * (q81/q83's pattern). The exact `percentile` aggregate is the oracle
    * anchor; `approxThresholds` is the 100 TB configuration — the same
    * one-row broadcast shape through `approx_percentile`
    * (Greenwald-Khanna, bounded memory at any corpus size; the exact
    * aggregate holds a per-value counts map). The bucket boundaries move
    * by the sketch tolerance, nothing else changes.
    */
  def qualityBuckets(docs: DataFrame, textCol: String, idCol: String,
                     sourceCol: String,
                     approxThresholds: Boolean = false): DataFrame = {
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val sc = TextAnalysis.lmScore(docs, textCol, idCol, minDf = 5,
      carry = Seq(sourceCol))
    def pct(p: Double) =
      if (approxThresholds) approx_percentile(col("lm_commonness"), lit(p), lit(10000))
      else percentile(col("lm_commonness"), lit(p))
    val th = sc.agg(pct(0.25).as("t_lo"), pct(0.75).as("t_hi"))
    sc.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("lm_commonness") >= col("t_hi"), "head")
          .when(col("lm_commonness") >= col("t_lo"), "middle")
          .otherwise("tail"))
      .groupBy(col(sourceCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("lm_commonness").cast(d6)).cast("double")
          / count(lit(1)), 6).as("avg_commonness"))
  }

  // ------------------------------------------------ epoch shuffle

  /** Deterministic global training order per epoch: every document gets a
    * dense 0-based `global_idx` in ascending `(h48(doc_id:epoch), doc_id)`
    * order — a reproducible corpus permutation that changes completely
    * between epochs (the salt is the epoch number) with no RNG state.
    *
    * A naive `row_number() OVER (ORDER BY h)` is a single-partition window
    * — the whole corpus through one task. And the range-partition +
    * `spark_partition_id` carry trick ([[Pipeline.packSequences]]) is
    * subtly fragile here: the carry frame and the in-shard numbering
    * traverse the range exchange in two plan branches, and if column
    * pruning makes the exchanges non-identical, ReuseExchange stops
    * deduplicating them — each branch then samples its OWN range
    * boundaries and the carries misalign. Because `h` is uniform by
    * construction (md5 bits), no sampled boundaries are needed at all:
    * shard by the FIXED-WIDTH bucket `(h · nShards) >> 48` — a pure
    * function of the row, identical in every plan branch, job and
    * partition layout, with balanced shards for free (no extra sampling
    * scan, which `repartitionByRange` pays). Shard order is h order, so
    * in-shard `row_number` (each window ≈ corpus/nShards) plus the
    * cumulative shard-count carry (a tiny broadcast frame) IS the global
    * order. CurationSpec pins nShards=3 against nShards=11.
    *
    * `nShards = 0` (the default) uses the session's
    * `spark.sql.shuffle.partitions` — the same parallelism every other
    * shuffle in the job runs at — which is safe precisely BECAUSE the
    * result is shard-count independent.
    */
  def epochShuffle(docs: DataFrame, idCol: String, epochs: Seq[Int],
                   nShards: Int = 0): DataFrame = {
    val shards: Long =
      if (nShards > 0) nShards.toLong
      else docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "8").toLong
    val keyed = docs
      .select(col(idCol).as("doc_id"))
      .withColumn("epoch", explode(array(epochs.map(lit(_)): _*)))
      .withColumn("h", h48(concat(col("doc_id").cast("string"), lit(":"),
        col("epoch").cast("string"))))
      .withColumn("shard", shiftright(col("h") * shards, 48))
    val wIn = Window.partitionBy(col("shard"), col("epoch"))
      .orderBy(col("h"), col("doc_id"))
    val withIn = keyed.withColumn("idx_in", row_number().over(wIn).cast("long") - 1)
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("shard"), col("epoch"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("shard"), col("epoch"), col("off"))
    withIn.join(broadcast(offsets), Seq("shard", "epoch"))
      .select(col("doc_id"), col("epoch"), (col("off") + col("idx_in")).as("global_idx"))
  }

  // ------------------------------------------------ per-domain caps

  /** Cap every domain/source at its `n` best documents (Gopher-style
    * per-domain limits): rank within source by `(rankBy DESC, id ASC)` and
    * keep ranks ≤ n.
    *
    * A bare `row_number() OVER (PARTITION BY source)` puts an entire hot
    * domain — potentially a double-digit fraction of a web corpus — into
    * one window partition. Two-phase instead: phase 1 ranks within
    * `(source, salt)` where salt = `h48(id) mod nSalts` (each window is
    * ~1/nSalts of the domain) and keeps its local top-n — which provably
    * contains the true top-n, since any globally top-n row is top-n within
    * its own salt; phase 2 re-ranks the ≤ n·nSalts survivors per source
    * (a bounded window) for the exact global ranks. Deterministic: ties
    * break by id.
    */
  def domainCap(docs: DataFrame, sourceCol: String, rankBy: Column,
                idCol: String, n: Int, nSalts: Int = 8): DataFrame = {
    val salted = docs.withColumn("salt",
      pmod(h48(col(idCol).cast("string")), lit(nSalts)))
    val w1 = Window.partitionBy(col(sourceCol), col("salt"))
      .orderBy(rankBy.desc, col(idCol))
    val phase1 = salted
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= n)
      .drop("rn", "salt")
    val w2 = Window.partitionBy(col(sourceCol)).orderBy(rankBy.desc, col(idCol))
    phase1
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= n)
  }

  // ------------------------------------------------ mixture allocation

  /** Training-mixture token allocation (the LLaMA/Pile mixing table): given
    * per-source mixture weights and a total token budget, compute each
    * source's sampling rate `min(1, w·budget / tokens_s)` and the epoch
    * count `w·budget / tokens_s` (> 1 means the source repeats). One
    * map-side token count, one 20-row aggregate — the output IS the
    * broadcast-sized sampling plan that [[Pipeline.weightedSample]] then
    * executes per-row.
    */
  def mixAllocation(docs: DataFrame, textCol: String, sourceCol: String,
                    weight: Column, budget: Long): DataFrame =
    mixAllocationWith(docs, sourceCol,
      size(tokens(col(textCol))).cast("long"), weight, budget)

  /** [[mixAllocation]] generalized over the per-document token counter —
    * the budgeting arithmetic is tokenizer-agnostic; `tok` is any pure
    * per-row column (whitespace `size(tokens(…))` for q108, the trained-
    * BPE count column for [[mixAllocationBpe]]). One corpus scan, a
    * mixture-table-sized groupBy — the allocation stays a broadcastable
    * side table at any corpus size.
    */
  def mixAllocationWith(docs: DataFrame, sourceCol: String, tok: Column,
                        weight: Column, budget: Long): DataFrame = {
    val perSource = docs
      .select(col(sourceCol).as("source"), tok.as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
    perSource
      .withColumn("w", weight)
      .withColumn("rate", round(least(lit(1.0), col("w") * budget / col("toks")), 6))
      .withColumn("epochs", round(col("w") * budget / col("toks"), 6))
      .withColumn("exp_toks", round(least(lit(1.0), col("w") * budget / col("toks"))
        * col("toks")).cast("long"))
  }

  /** Mix allocation budgeted in TRAINED-TOKENIZER tokens instead of
    * whitespace words — the number a real mix planner feeds a token-budget
    * target with (a 20 %-over-segmented source under the tokenizer gets a
    * correspondingly lower per-doc sampling rate; whitespace counts can't
    * see that). Composition of q161/q165's BPE machinery with q108's
    * allocation arithmetic:
    *
    *  1. train `rounds` merges on the corpus itself ([[TextAnalysis
    *     .bpeTrainPairs]] — vocab-sized per round, a ~R-row model);
    *  2. count each document under the trained table as ONE map-only
    *     codegen column ([[TextAnalysis.bpeCountCol]] — the merge table
    *     ships as literals inside the projection, no join, no second
    *     training pass);
    *  3. the [[mixAllocationWith]] groupBy — mixture-table-sized.
    *
    * At 100 TB: two corpus scans total (one feeding the vocab groupBy the
    * training loop iterates on, one for the count+allocate pass), both
    * map-side-combined; everything between is control-plane sized.
    */
  def mixAllocationBpe(docs: DataFrame, textCol: String, sourceCol: String,
                       weight: Column, budget: Long, rounds: Int): DataFrame =
    mixAllocationWith(docs, sourceCol,
      TextAnalysis.bpeCountCol(col(textCol),
        TextAnalysis.bpeTrainPairs(docs, textCol, rounds)),
      weight, budget)

  /** Materialize the training mix that [[mixAllocation]] planned: each
    * document of source `s` appears `floor(epochs_s)` times, plus one more
    * copy with probability `frac(epochs_s)` decided by the deterministic
    * h48 coin on `(doc, copy)` — so `epochs < 1` degenerates to exactly
    * the rate-sampling path and `epochs > 1` to data repeating with a
    * correctly-sampled fractional epoch (the data-constrained-scaling
    * recipe: repeat under-budget sources, sample over-budget ones).
    *
    * Zero shuffle end-to-end: the allocation frame is mixture-table-sized
    * (one row per source) and broadcasts onto a single corpus scan; the
    * per-row explode is bounded by `ceil(epochs)`. Reproducible at any
    * parallelism — no RNG state, the coin is a pure row function.
    */
  def mixMaterialize(docs: DataFrame, textCol: String, sourceCol: String,
                     idCol: String, weight: Column, budget: Long): DataFrame = {
    val alloc = mixAllocation(docs, textCol, sourceCol, weight, budget)
      .select(col("source"), col("epochs"))
    docs
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("tok"))
      .join(broadcast(alloc), "source")
      // A zero-weight source must vanish, and it must do so BEFORE the
      // explode: Spark's `sequence(0, -1)` steps DOWNWARD ([0, -1]), so an
      // epochs=0 row would emit a spurious copy_idx=-1 that the
      // `copy_idx < floor(0)` filter then keeps.
      .filter(col("epochs") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0), ceil(col("epochs")).cast("int") - 1)))
      .filter(col("copy_idx") < floor(col("epochs")) ||
        h48(concat(col("doc_id").cast("string"), lit(":"),
          col("copy_idx").cast("string"))) <
          (col("epochs") - floor(col("epochs"))) * lit(math.pow(2, 48)))
      .select(col("doc_id"), col("source"), col("copy_idx"), col("tok"))
  }

  /** The whole curation layer as ONE declarative plan — exact dedup →
    * corpus-LM quality gate → per-domain cap → deterministic training
    * order: what a user actually runs nightly. Every stage is the library
    * operator above, so the composition inherits each stage's scale shape
    * (hash-bucketed dedup groupBy, broadcast vocabulary, salted two-phase
    * cap, fixed-width-shard order); Catalyst fuses the stages into one
    * job — no materialization barriers between them.
    *
    * Scale config: `minDf` (vocab membership) and `capN` (per-domain keep)
    * are ABSOLUTE thresholds that must scale ∝ corpus to keep their
    * selectivity constant — the same rule as [[Dedup.dfCapFor]]; the
    * three-point study runs this pipeline with both scaled and fits the
    * composed exponent (BENCH_sf3.md).
    */
  def curationPipeline(docs: DataFrame, textCol: String, idCol: String,
                       sourceCol: String, rankBy: Column, capN: Int,
                       maxOov: Double, minDf: Int = 5): DataFrame = {
    val keep = Dedup.exact(docs, col(textCol), col(idCol))
      .select(col("keep_id").as(idCol))
    val deduped = docs.join(keep, idCol)
    val scored = TextAnalysis.lmScore(deduped, textCol, idCol, minDf = minDf,
        carry = Seq(sourceCol, "n_chars"))
      .filter(col("oov_rate") <= maxOov)
      .withColumnRenamed("doc", idCol)
    val capped = domainCap(scored, sourceCol, rankBy, idCol, capN)
      .select(col(idCol), col(sourceCol), col("n_occ").as("tok"))
    epochShuffle(capped, idCol, Seq(0))
      .select(col(idCol), col("global_idx"))
      .join(capped, idCol)
      .select(col(idCol), col(sourceCol), col("tok"), col("global_idx"))
  }

  // ------------------------------------------------ DSIR importance weights

  /** Data Selection via Importance Resampling (Xie et al. 2023): score every
    * document by how much more likely its hashed-unigram bag is under the
    * TARGET distribution than under the raw-pool distribution,
    * `w(d) = Σ_tok  ln( p_target(f(tok)) / p_raw(f(tok)) )`,
    * with `f(tok) = h48(tok) mod nFeatures` and add-α smoothing on both
    * distributions. Selecting the top-weighted raw docs shifts the pool
    * toward the target domain without a trained classifier — the published
    * cheap alternative to quality-model filtering.
    *
    * Determinism: per-feature log-ratios are rounded ONCE to integer
    * micro-nats (`round(ln(ratio)·1e6)`), so the per-doc score is an exact
    * BIGINT sum — independent of partitioning and aggregation order, and
    * bit-reproducible in DuckDB (the ratio's numerator/denominator are
    * exact integer products < 2⁵³, so even the `ln` argument is identical;
    * a last-ulp `ln` difference would have to land within 5e-7 of a
    * rounding boundary to flip anything).
    *
    * 100 TB shape: one corpus scan explodes tokens to feature ids; the
    * feature stats are an `nFeatures`-row aggregate (map-side combined —
    * the key space is FIXED at nFeatures regardless of corpus size) that
    * comes back as a broadcast λ-table; the scoring pass is then a
    * broadcast join + one exact per-doc LONG sum on the doc key. Nothing
    * driver-side, no vocabulary explosion — that is the point of hashed
    * features.
    */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
                  isTarget: Column, nFeatures: Int = 1024,
                  alpha: Long = 1L): DataFrame = {
    val occ = docs
      .select(col(idCol).as("doc"), isTarget.as("tgt"),
        explode(tokens(col(textCol))).as("tok"))
      .select(col("doc"), col("tgt"), pmod(h48(col("tok")), lit(nFeatures)).as("f"))
    val stats = occ.groupBy("f").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tf"),
      count(lit(1)).as("rf"))
    val tot = stats.agg(sum(col("tf")).as("t_tot"), sum(col("rf")).as("r_tot"))
    val lam = stats.crossJoin(broadcast(tot))
      .select(col("f"),
        round(log(((col("tf") + alpha) * (col("r_tot") + alpha * nFeatures)) /
                  ((col("rf") + alpha) * (col("t_tot") + alpha * nFeatures)))
          * 1e6).cast("long").as("lam"))
    occ.join(broadcast(lam), "f")
      .groupBy(col("doc"))
      .agg(sum(col("lam")).as("w_micro"))
  }

  /** DuckDB twin of [[dsirWeights]]' arithmetic, as CTEs over `table`
    * ending in `per(doc, w_micro)`. `targetPred` is the SQL form of
    * `isTarget`.
    */
  def dsirOracleCtes(table: String, textCol: String, idCol: String,
                     targetPred: String, nFeatures: Int = 1024,
                     alpha: Long = 1L): String =
    s"""occ AS (SELECT $idCol AS doc, $targetPred AS tgt,
                  unnest(${sqlTokens(textCol)}) AS tok
                FROM $table),
        fo AS (SELECT doc, tgt, ${sqlH48("tok")} % $nFeatures AS f FROM occ),
        stats AS (SELECT f, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tf,
                         COUNT(*) AS rf
                  FROM fo GROUP BY f),
        tot AS (SELECT SUM(tf) AS t_tot, SUM(rf) AS r_tot FROM stats),
        lam AS (SELECT f,
                  CAST(round(ln( ((tf + $alpha) * (r_tot + $alpha * $nFeatures)) * 1.0
                               / ((rf + $alpha) * (t_tot + $alpha * $nFeatures)) )
                    * 1e6) AS BIGINT) AS lam
                FROM stats CROSS JOIN tot),
        per AS (SELECT doc, CAST(SUM(lam) AS BIGINT) AS w_micro
                FROM fo JOIN lam USING (f) GROUP BY doc)"""

  // ------------------------------------------------ driver-facing queries

  val queries: Seq[Query] = Seq(
    // Maximal duplicated-span cut list: q103's windows merged per doc.
    Query(
      "q104_span_merge",
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        posed AS (
          SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 9)) AS pos
          FROM toks WHERE len(ts) >= 10
        ),
        spans AS (
          SELECT doc_id, pos, array_to_string(ts[pos : pos + 9], ' ') AS span
          FROM posed
        ),
        stats AS (
          SELECT span, COUNT(*) AS n_occ,
                 MIN({'d': doc_id, 'p': pos}) AS first_occ
          FROM spans GROUP BY span HAVING COUNT(*) >= 2
        ),
        rem AS (
          SELECT s.doc_id, s.pos
          FROM spans s JOIN stats t USING (span)
          WHERE NOT (s.doc_id = t.first_occ.d AND s.pos = t.first_occ.p)
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > COALESCE(
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                     -4611686018427387904) + 10
                   THEN 1 ELSE 0 END AS ni
          FROM rem
        ),
        num AS (
          SELECT doc_id, pos,
                 CAST(SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
                   AS island
          FROM isl
        )
        SELECT doc_id, island, MIN(pos) AS start_pos, MAX(pos) + 9 AS end_tok,
               COUNT(*) AS n_windows
        FROM num GROUP BY doc_id, island
        ORDER BY doc_id, start_pos"""))((spark, dir) => {
      mergedDuplicateSpans(Tables(spark, dir).documents, "text", "doc_id")
        .orderBy(col("doc_id"), col("start_pos"))
    }),

    // CCNet head/middle/tail quality split per source.
    Query(
      "q105_quality_buckets",
      Some(s"""
        WITH occ AS (SELECT doc_id AS doc, source,
                       unnest(${sqlTokens("text")}) AS tok
                     FROM documents),
        vocab AS (SELECT tok, COUNT(*) AS df
                  FROM (SELECT DISTINCT doc, tok FROM occ)
                  GROUP BY tok HAVING COUNT(*) >= 5),
        n AS (SELECT COUNT(*) AS n_corpus FROM documents),
        sc AS (SELECT o.doc, o.source,
                 CASE WHEN COUNT(v.df) > 0
                      THEN round(COALESCE(SUM(v.df), 0) * 1.0
                             / (COUNT(v.df) * ANY_VALUE(n_corpus)), 6)
                      ELSE 0.0 END AS lm_commonness
               FROM occ o LEFT JOIN vocab v USING (tok) CROSS JOIN n
               GROUP BY o.doc, o.source),
        th AS (SELECT quantile_cont(lm_commonness, 0.25) AS t_lo,
                      quantile_cont(lm_commonness, 0.75) AS t_hi
               FROM sc),
        tagged AS (SELECT source, lm_commonness,
                     CASE WHEN lm_commonness >= t_hi THEN 'head'
                          WHEN lm_commonness >= t_lo THEN 'middle'
                          ELSE 'tail' END AS bucket
                   FROM sc CROSS JOIN th)
        SELECT source, bucket, COUNT(*) AS n_docs,
               round(CAST(SUM(CAST(lm_commonness AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_commonness
        FROM tagged GROUP BY source, bucket
        ORDER BY source, bucket"""))((spark, dir) => {
      qualityBuckets(Tables(spark, dir).documents, "text", "doc_id", "source")
        .orderBy(col("source"), col("bucket"))
    }),

    // Deterministic two-epoch corpus shuffle with dense global order.
    Query(
      "q106_epoch_shuffle",
      Some(s"""
        WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
        k AS (SELECT doc_id, epoch,
                ${sqlH48("doc_id::VARCHAR || ':' || epoch::VARCHAR")} AS h
              FROM e)
        SELECT doc_id, epoch,
               row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1
                 AS global_idx
        FROM k ORDER BY epoch, global_idx"""))((spark, dir) => {
      epochShuffle(Tables(spark, dir).documents, "doc_id", Seq(0, 1))
        .orderBy(col("epoch"), col("global_idx"))
    }),

    // Per-domain cap: keep each source's 10 longest docs, exact ranks.
    Query(
      "q107_domain_cap",
      Some("""
        SELECT source, rank, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents)
        WHERE rank <= 10
        ORDER BY source, rank"""))((spark, dir) => {
      domainCap(Tables(spark, dir).documents, "source", col("n_chars"),
          "doc_id", n = 10)
        .select(col("source"), col("rank"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("rank"))
    }),

    // Mixture allocation: weights derived from the source id so both
    // engines compute them without a side table (w ∈ {.02,.04,.06,.08}).
    Query(
      "q108_mix_allocation",
      Some(s"""
        WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS toks
          FROM documents GROUP BY source
        )
        SELECT source, n_docs, toks,
               (CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0 AS w,
               round(least(1.0, (CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0
                 * 50000 / toks), 6) AS rate,
               round((CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0
                 * 50000 / toks, 6) AS epochs,
               CAST(round(least(1.0, (CAST(substr(source, 4) AS INT) % 4 + 1)
                 / 50.0 * 50000 / toks) * toks) AS BIGINT) AS exp_toks
        FROM per ORDER BY source"""))((spark, dir) => {
      val w = (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0)
      mixAllocation(Tables(spark, dir).documents, "text", "source", w, 50000L)
        .select(col("source"), col("n_docs"), col("toks"), col("w"),
          col("rate"), col("epochs"), col("exp_toks"))
        .orderBy(col("source"))
    }),

    // Materialized mix: repeats + fractional-epoch coin, per (doc, copy).
    Query(
      "q109_mix_materialize",
      Some(s"""
        WITH per AS (
          SELECT source,
                 CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS toks
          FROM documents GROUP BY source
        ),
        a AS (
          SELECT source,
                 round((CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0
                   * 50000 / toks, 6) AS epochs
          FROM per
        ),
        d AS (
          SELECT doc_id, source, CAST(len(${sqlTokens("text")}) AS BIGINT) AS tok
          FROM documents
        ),
        j AS (
          SELECT d.doc_id, d.source, d.tok, a.epochs
          FROM d JOIN a USING (source)
        ),
        x AS (
          SELECT doc_id, source, tok, epochs,
                 unnest(generate_series(0, CAST(ceil(epochs) AS INT) - 1))
                   AS copy_idx
          FROM j
        )
        SELECT doc_id, source, copy_idx, tok
        FROM x
        WHERE copy_idx < floor(epochs)
           OR ${sqlH48("doc_id::VARCHAR || ':' || copy_idx::VARCHAR")}
                < (epochs - floor(epochs)) * 281474976710656.0
        ORDER BY doc_id, copy_idx"""))((spark, dir) => {
      val w = (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0)
      mixMaterialize(Tables(spark, dir).documents, "text", "source",
          "doc_id", w, 50000L)
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // Mix allocation budgeted in TRAINED-BPE tokens (q108 under the q161
    // tokenizer): train 8 merges, count every doc in one map-only codegen
    // projection, allocate per source. The oracle replays training +
    // encode via the q165 CTE chain, then the q108 arithmetic.
    Query(
      "q167_mix_bpe_budget",
      Some(s"""
        WITH ${TextAnalysis.bpeEncodeCtes("documents", "text", "doc_id", 8)},
        cnt AS (SELECT doc,
                  CAST((len(s) - len(replace(s, '|', ''))) // 2 AS BIGINT)
                    AS tok
                FROM e8),
        per AS (SELECT d.source, COUNT(*) AS n_docs,
                  CAST(SUM(c.tok) AS BIGINT) AS toks
                FROM documents d JOIN cnt c ON c.doc = d.doc_id
                GROUP BY d.source)
        SELECT source, n_docs, toks,
               (CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0 AS w,
               round(least(1.0, (CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0
                 * 50000 / toks), 6) AS rate,
               round((CAST(substr(source, 4) AS INT) % 4 + 1) / 50.0
                 * 50000 / toks, 6) AS epochs,
               CAST(round(least(1.0, (CAST(substr(source, 4) AS INT) % 4 + 1)
                 / 50.0 * 50000 / toks) * toks) AS BIGINT) AS exp_toks
        FROM per ORDER BY source"""))((spark, dir) => {
      val w = (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0)
      mixAllocationBpe(Tables(spark, dir).documents, "text", "source",
          w, 50000L, rounds = 8)
        .select(col("source"), col("n_docs"), col("toks"), col("w"),
          col("rate"), col("epochs"), col("exp_toks"))
        .orderBy(col("source"))
    }),

    // The full curation layer in one job: dedup -> quality -> cap -> order.
    Query(
      "q110_curation_e2e",
      Some(s"""
        WITH keep AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        occ AS (SELECT doc_id AS doc, source, n_chars,
                  unnest(${sqlTokens("text")}) AS tok
                FROM dd),
        vocab AS (SELECT tok, COUNT(*) AS df
                  FROM (SELECT DISTINCT doc, tok FROM occ)
                  GROUP BY tok HAVING COUNT(*) >= 5),
        per AS (SELECT o.doc, o.source, o.n_chars,
                  COUNT(*) AS n_occ, COUNT(v.df) AS n_in
                FROM occ o LEFT JOIN vocab v USING (tok)
                GROUP BY o.doc, o.source, o.n_chars),
        q AS (SELECT doc AS doc_id, source, n_chars, n_occ
              FROM per
              WHERE round((n_occ - n_in) * 1.0 / n_occ, 6) <= 0.5),
        cap AS (SELECT doc_id, source, n_occ,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rnk
                FROM q),
        kept AS (SELECT doc_id, source, n_occ FROM cap WHERE rnk <= 15)
        SELECT doc_id, source, CAST(n_occ AS BIGINT) AS tok,
               row_number() OVER (
                 ORDER BY ${sqlH48("doc_id::VARCHAR || ':0'")}, doc_id) - 1
                 AS global_idx
        FROM kept ORDER BY global_idx"""))((spark, dir) => {
      curationPipeline(Tables(spark, dir).documents, "text", "doc_id",
          "source", col("n_chars"), capN = 15, maxOov = 0.5)
        .orderBy(col("global_idx"))
    }),

    // DSIR importance resampling: English docs are the target domain; every
    // NON-English doc is scored by its hashed-unigram importance weight and
    // the top 3 per source survive (the per-domain quota keeps the selected
    // set mixture-shaped instead of single-source). Selection runs through
    // the salted two-phase top-k; the oracle's plain window proves the
    // two-phase exact. Integer micro-nat weights make the ranking — not
    // just the weights — engine-exact.
    Query(
      "q124_dsir",
      Some(s"""
        WITH ${dsirOracleCtes("documents", "text", "doc_id",
                              targetPred = "lang = 'en'")},
        raw AS (SELECT d.doc_id, d.source, p.w_micro
                FROM documents d JOIN per p ON p.doc = d.doc_id
                WHERE d.lang <> 'en'),
        rk AS (SELECT doc_id, source, w_micro,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY w_micro DESC, doc_id) AS rank
               FROM raw)
        SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, w_micro
        FROM rk WHERE rank <= 3
        ORDER BY source, rank"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val w = dsirWeights(docs, "text", "doc_id", isTarget = col("lang") === "en")
      val raw = docs.filter(col("lang") =!= "en")
        .select(col("doc_id"), col("source"))
        .join(w, col("doc_id") === col("doc"))
      domainCap(raw, "source", col("w_micro"), "doc_id", n = 3)
        .select(col("source"), col("rank"), col("doc_id"), col("w_micro"))
        .orderBy(col("source"), col("rank"))
    }),

    // Streamed-curation RETRACTION (q150's lesson applied to the streamed
    // text corpus): bootstrap the three DeltaView-backed curation views
    // from one signed I batch, then a signed D batch takes down every
    // doc_id ≡ 3 (mod 10) — set/band rows tombstoned in the same commit,
    // df-cap universe frozen. The oracle rebuilds the bootstrap admission
    // from first principles (lang/quality gates, exact dedup, the SAME
    // machine-generated LSH pair CTEs q27 verifies for the in-batch
    // dominance, first-arrival cap) and filters the survivors — streamed
    // retract ≡ rebuild-minus-deleted, the q150 equivalence for the
    // STREAMED views. Delete-then-reinsert and replayed-delete semantics
    // are spec-gated (CurationStreamSpec), not oracled: they need batch
    // SEQUENCING the one-shot SQL replay cannot express.
    Query(
      "q155_curation_stream_retract",
      Some(s"""
        WITH elig AS (SELECT doc_id, text, source FROM documents
                      WHERE ${TextAnalysis.langGuessSqlExpr("text")} = 'en'
                        AND ${TextAnalysis.qualityKeepSqlExpr("text")}),
        keep AS (SELECT MIN(doc_id) AS doc_id FROM elig GROUP BY md5(text)),
        e2 AS (SELECT e.doc_id, e.text, e.source
               FROM elig e JOIN keep USING (doc_id)),
        ${Dedup.minhashLshPairCtes("e2", "text", "doc_id")},
        drop1 AS (SELECT DISTINCT doc_b AS doc_id FROM prs),
        reps AS (SELECT * FROM e2
                 WHERE doc_id NOT IN (SELECT doc_id FROM drop1)),
        cap AS (SELECT doc_id, source, text,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY doc_id) AS rn
                FROM reps),
        adm AS (SELECT doc_id, source, text FROM cap WHERE rn <= 15)
        SELECT doc_id, source, md5(text) AS hash
        FROM adm WHERE doc_id % 10 <> 3 ORDER BY doc_id"""))((spark, dir) => {
      import graft.streaming.CurationStream
      val d = Tables(spark, dir).documents
        .select(col("doc_id"), col("text"), col("source"))
      // the frozen df-cap universe: built over the bootstrap batch's
      // post-gate survivors, so the oracle's pair CTEs (which derive df
      // stats from e2) replay the identical universe. The gated frame is
      // eagerly checkpointed (self-releasing) — it feeds the exact-dedup
      // groupBy AND the semi-join back, and without the boundary the
      // gate scan would run twice more here on top of the legs' own
      val eligible = d.filter(
        TextAnalysis.langGuessExpr(col("text")) === "en" &&
        TextAnalysis.qualityKeepExpr(col("text"))).localCheckpoint()
      val keep = Dedup.exact(eligible, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id"))
      val ok = Dedup.lshIndexBuild(
        eligible.join(keep, Seq("doc_id"), "left_semi"),
        "text", "doc_id").ok.cache()
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q155").toString
      CurationStream.applySignedBatchDelta(spark, tmp, ok,
        d.select(lit("I").as("op"), col("doc_id"), col("text"),
          col("source")), batchId = 0L, capN = 15)
      CurationStream.applySignedBatchDelta(spark, tmp, ok,
        d.filter(col("doc_id") % 10 === 3)
          .select(lit("D").as("op"), col("doc_id"), col("text"),
            col("source")), batchId = 1L, capN = 15)
      ok.unpersist()
      CurationStream.readDocsDelta(spark, tmp).orderBy(col("doc_id"))
    })
  )
}
