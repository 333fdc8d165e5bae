package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB engine needs both:
  *  - [[topKBruteForce]]: exact k-NN. The candidate set is `queries ×
  *    corpus` with the (small) query side broadcast, so the corpus is
  *    scanned once with no shuffle of the vectors; top-k is taken in TWO
  *    phases — a salted per-(query, salt) partial top-k, then the final
  *    per-query top-k over `k × nSalts` survivors — so no single reducer
  *    ever sees a whole query's candidate list (the naive
  *    `Window.partitionBy(query)` plan creates one giant partition per
  *    query at scale).
  *  - [[annLsh]]: random-hyperplane LSH (multiple tables). Candidates =
  *    vectors sharing a bucket with the query in ≥1 table; cost is a join
  *    on (table, bucket) — sublinear probing at the price of recall < 1.
  *    The DedupSpec-style recall harness lives in SimilaritySpec.
  *
  * Caching contract (the [[Dedup]] header's, restated for this file):
  * multiply-consumed CORPUS-SIZED intermediates on serving paths
  * ([[annIvfPq]]'s residual frame, [[annIvfIndexed]]'s probe list) are
  * eagerly `localCheckpoint()`ed, never `cache()`d — checkpoint blocks
  * self-release via ContextCleaner when the frame becomes unreachable,
  * so a long-lived serving session calling these repeatedly pins no
  * storage (SimilaritySpec "serving calls pin no storage blocks" gates
  * it). The k-means/PQ TRAINING loops keep `persist(MEMORY_AND_DISK)` +
  * explicit `unpersist()` in-method, Spark MLlib's own policy.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (LCG), values in [-1, 1). */
  private[graft] def hyperplanes(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x2545F4914F6CDD1DL
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(next())))
  }

  /** Exact top-k cosine neighbors for each query vector. */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int, nSalts: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions._
    val c = corpus.select(col(idCol).as("vec_id"), toDense(col(vecCol)).as("v"))
      .withColumn("vn", norm2(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDense(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dotd(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cos"))
    // Phase 1: salted partial top-k (bounds any single partition's work).
    val salted = scored.withColumn("salt", pmod(crc32(col("vec_id").cast("string")), lit(nSalts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("cos").desc, col("vec_id"))
    val partial = salted.withColumn("rn", row_number().over(w1)).filter(col("rn") <= k)
    // Phase 2: exact top-k over k × nSalts survivors per query.
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    partial.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Deterministic Lloyd k-means over the embedding column, for IVF cell
    * centroids: init = the first `k` corpus vectors, then `iters` fixed
    * assignment/mean rounds. Per-dimension means route through DECIMAL so
    * the centroids are bit-identical at any partition count (double
    * summation order would otherwise leak into cell boundaries). Each
    * round's driver materialization is the k×dim model ONLY — assignment is
    * the same map-side-combinable argmax as [[annIvf]] and the per-cell
    * means are one partial-aggregated shuffle of (cell, pos) scalars; the
    * corpus itself never leaves executors, so the loop is 100 TB-shaped
    * (iters × one pass over the data).
    *
    * Returns a (cid: long, cv: array<double>) frame pluggable into
    * [[annIvf]]'s `centroids` parameter. A cell that loses all members
    * keeps its previous centroid.
    */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
                      k: Int = 16, iters: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions._
    val spark = corpus.sparkSession
    import spark.implicits._
    // Persist the projected (id, vector) frame for the duration of the loop
    // — each Lloyd round re-reads it, and MEMORY_AND_DISK keeps the pattern
    // valid when the projection outgrows executor memory (same policy as
    // Spark MLlib's own KMeans).
    val vecs = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Seeds = the first k vectors of the DETERMINISTIC id ordering (a
    // TakeOrdered, not a filter on `vec_id < k` — ids are not required to
    // start at 0 or be dense; any corpus yields exactly k seeds).
    var cent: Map[Long, Seq[Double]] = vecs.orderBy(col("vec_id")).limit(k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue()))
      .toMap
    for (_ <- 1 to iters) {
      // map-only argmax over the driver-resident centroid model (the loop
      // state IS a driver map) — each Lloyd round is one fused scan + one
      // partially-aggregated shuffle of (cell, pos) scalars, no joins
      val m = ArgMax.cosModelOf(
        cent.toSeq.sortBy(_._1).map { case (cid, cv) => (cid, cv.toArray) })
      // NearestId yields a NULL cell for dim-mismatched or null vectors
      // (where the old join+rescore form dropped the row). Row.getLong on
      // that null below would read 0 and silently fold the bad row into
      // centroid 0 — exclude it instead, preserving the drop semantics.
      val assigned = vecs.select(
        ArgMax.argmaxCosine(m, col("v")).as("cell"), col("v"))
        .filter(col("cell").isNotNull)
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("val").cast(org.apache.spark.sql.types.DecimalType(27, 12)))
          .cast("double").as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv"))
      val updated = means.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      cent = cent.map { case (cid, old) => cid -> updated.getOrElse(cid, old) }
    }
    vecs.unpersist()
    cent.toSeq.sortBy(_._1).toDF("cid", "cv")
  }

  /** IVF-style ANN: partition the corpus into `nCells` Voronoi cells around
    * deterministic centroid vectors, then search only the query's `nProbe`
    * nearest cells. The scale path complementing [[annLsh]]: assignment is
    * the sort-free [[ArgMax.rescoreArgmax]] (whole-stage-codegen
    * HashAggregates; see that object for why struct-max is NOT map-side
    * combinable in practice — it plans SortAggregate), the
    * centroid table is broadcast everywhere, and the candidate join keys on
    * the cell id — at 100 TB the corpus is scanned once to build the index
    * and each query touches `nProbe / nCells` of the data.
    *
    * Default centroids are the first `nCells` corpus vectors (deterministic,
    * so the DuckDB oracle can reproduce the exact cells — q51); pass
    * [[kmeansCentroids]] output for real data-adapted cells behind the same
    * plan shape (q53 gates its recall).
    */
  def annIvf(corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
             k: Int, nCells: Int = 16, nProbe: Int = 2,
             centroids: Option[DataFrame] = None,
             matchCol: Option[String] = None): DataFrame = {
    import graft.functions.VectorFunctions._
    val mc = matchCol.toSeq
    val cent = centroids.getOrElse(corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cv")))
    // Nearest-centroid assignment: argmax cosine, ties to the smaller
    // cid, as ONE map-only projection over the collected centroid model
    // (ArgMax.argmaxCosine — see its scaladoc for why this beats both
    // max(struct) and the join+rescore form). `matchCol` (filtered
    // search: a metadata column that must MATCH between query and
    // corpus — tenant, language, label) rides the row and then joins as
    // part of the candidate KEY below: the filter shrinks the candidate
    // join instead of post-filtering a top-k (which would silently
    // return < k) or scanning unfiltered cells.
    val am = ArgMax.cosModel(cent, "cv", "cid")
    val assigned = corpus.select(col(idCol).as("vec_id") +:
      ArgMax.argmaxCosine(am, col(vecCol)).as("cell") +:
      col(vecCol).as("v") +: mc.map(col): _*)
    // Probe list: each query's nProbe nearest centroids (query side is small).
    val probes = queries
      .select(col(idCol).as("query_id") +: col(vecCol).as("qv") +: mc.map(col): _*)
      .join(broadcast(cent))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(cosineFast(col("qv"), col("cv")).desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id") +: col("qv") +: col("cid").as("cell") +: mc.map(col): _*)
    val scored = assigned.join(broadcast(probes), Seq("cell") ++ mc)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosineFast(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Approximate top-k via multi-table hyperplane LSH.
    *
    * Defaults (24 tables × 4 planes) are tuned on the synthetic embeddings:
    * recall@5 ≥ 0.96 vs [[topKBruteForce]] at sf0.01 and sf0.1 (fewer
    * planes → wider buckets → more candidates per table; more tables →
    * more chances to collide with a true neighbor). SimilaritySpec gates
    * recall ≥ 0.8.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
             k: Int, tables: Int = 24, planes: Int = 4, dim: Int = 64,
             maxCandEstimate: Long = 4000000000L): DataFrame = {
    val hp = hyperplanes(tables, planes, dim)
    // All `tables` bucket ids come from ONE fused expression (a single pass
    // over the vector + flat weight matrix) rather than tables × planes
    // separate dot-product columns — same sign bits, ~2.5× less scan time.
    def withBuckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"${id}_v"),
        posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
          col(vecCol), hp)).as(Seq("t", "b")))
    val cb = withBuckets(corpus, "vec_id")
    val qb = withBuckets(queries, "query_id")
    // Scale contract (the setSimJoinPrefix pattern): with `planes`-bit
    // buckets the candidate volume is Σ_{t,b} n_c·n_q — quadratic when
    // the query batch grows with the corpus (4-plane tables = 16 buckets:
    // n·q·24/16 expected) — and computable from two TINY histograms
    // (≤ tables·2^planes rows each) before any vector moves; the only
    // real cost is one extra column-pruned corpus scan for the bucket
    // projection. Past the bound the operator refuses, naming the
    // indexed ANN family (cells ∝ n, pruned scans) as the serving path.
    val candEst = cb.groupBy(col("t"), col("b"))
      .agg(count(lit(1)).as("nc"))
      .join(qb.groupBy(col("t"), col("b")).agg(count(lit(1)).as("nq")),
        Seq("t", "b"))
      .agg(coalesce(sum(col("nc") * col("nq")), lit(0L)).as("cand"))
      .head().getLong(0)
    if (candEst > maxCandEstimate)
      throw new graft.util.ContractRefusal(
        s"annLsh: estimated bucket-collision candidate volume $candEst " +
        s"exceeds the bound $maxCandEstimate (fixed $planes-plane tables " +
        "put expected collisions at n·q·tables/2^planes — quadratic when " +
        "queries grow with the corpus); serve through the persisted IVF " +
        "index family (Similarity.annIvfIndexed / annIvfPq — cells ∝ n, " +
        "partition-pruned scans) or shrink the query batch")
    val candidates = cb.join(broadcast(qb), Seq("t", "b"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_id_v"), col("vec_id"), col("vec_id_v"))
    // Score BEFORE deduplicating the ≤`tables` bucket collisions per pair:
    // a 64-float dot product per duplicate is cheap, while a distinct() on
    // the vector columns would shuffle every candidate's two embeddings.
    // This way the dedup aggregate shuffles only (query_id, vec_id, cos)
    // scalars, with map-side partial aggregation.
    val scored = candidates.select(col("query_id"), col("vec_id"),
      graft.functions.VectorFunctions.cosineFast(
        graft.functions.VectorFunctions.toDense(col("query_id_v")),
        graft.functions.VectorFunctions.toDense(col("vec_id_v"))).as("cos"))
      .groupBy(col("query_id"), col("vec_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Deterministic random-projection matrix (same LCG family as
    * [[hyperplanes]], different seed), rows in [-1, 1).
    */
  private[operators] def projectionMatrix(k: Int, dim: Int): Seq[Seq[Double]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(k)(Seq.fill(dim)(next()))
  }

  /** Johnson-Lindenstrauss random projection: compress `dim`-D embeddings to
    * `k`-D with a deterministic matrix, scaled 1/sqrt(k). With k=16 the
    * scale is exactly 0.25 (representable), so every projected value is
    * bit-reproducible in SQL from the embedded literal rows. Pure per-row
    * map over codegen'd [[graft.functions.DotProductD]] expressions — no
    * shuffle; at 100 TB this is the cheap pre-step that shrinks ANN index
    * storage 4x.
    */
  /** The persisted-index form of [[annIvf]] — the "build offline, serve
    * online" ANN pattern that actually runs at 100 TB: the cell assignment
    * is written ONCE as a parquet table partitioned by `cell=`, and the
    * query path reads ONLY the probed cells: the probe list is
    * control-plane sized (≤ nProbe·|queries| values over ≤ nCells distinct
    * cells), so its distinct cells come to the driver and prune the index
    * scan STATICALLY (`PartitionFilters: cell IN (…)` — gated in
    * PlanSpec), exactly what an ANN serving tier does with its known
    * probes. Serving cost is O(probed cells), not O(corpus). Same
    * deterministic centroids and tie rules as q51, so the persisted path
    * answers bit-identically.
    *
    * The index lives in a per-JVM temp dir keyed by corpus dir (same
    * concurrency contract as the bucketed-join tables: concurrent JVMs
    * never clobber each other; rebuilds within a JVM are memoized).
    */
  def ivfIndexFor(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                  nCells: Int = 16): String =
    // Memo key covers EVERY input that shapes the index (corpus dir AND
    // nCells); the shared memoizedIndex contract handles the temp root,
    // the per-JVM memo, and collision-proof dir naming.
    graft.PartitionedWrites.memoizedIndex(s"ivf#$sfDir#$nCells") { path => {
      import graft.functions.VectorFunctions._
      val corpus = Tables(spark, sfDir).embeddings
      // Seeds = first nCells vectors by id ORDER, not `vec_id < nCells` —
      // ids are not required to be dense or zero-based (same rule as
      // kmeansCentroids' seeding; identical picks on dense ids).
      val cent = corpus.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val im = ArgMax.cosModel(cent, "cv", "cid")
      val assigned = corpus.select(col("vec_id"),
        col("embedding").as("v"),
        ArgMax.argmaxCosine(im, col("embedding")).cast("int").as("cell"))
      // Cluster before the dynamic-partition write: nCells grows with the
      // corpus, so a raw partitionBy here opens tasks × nCells files — the
      // worst instance of the pattern PartitionedWrites exists to bound
      // (the serving scan is partition-pruned to probed cells; its cost is
      // per-FILE within those cells).
      graft.PartitionedWrites.cluster(assigned, "cell")
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    }: Unit }

  def annIvfIndexed(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                    k: Int, nCells: Int = 16, nProbe: Int = 2,
                    queryIds: Option[Seq[Long]] = None): DataFrame = {
    import graft.functions.VectorFunctions._
    val idx = spark.read.parquet(ivfIndexFor(spark, sfDir, nCells))
    val t = Tables(spark, sfDir)
    val cent = t.embeddings.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // default query set = every 100th vector (the q51/q91 fixture); an
    // explicit id list (the hybrid-retrieval read path, q162) reaches the
    // query-vector scan as a pushed `vec_id IN (…)` filter
    val qset = queryIds match {
      case Some(ids) => t.embeddings.filter(col("vec_id").isin(ids: _*))
      case None => t.embeddings.filter(col("vec_id") % 100 === 0)
    }
    val probes = qset
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(broadcast(cent))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(cosineFast(col("qv"), col("cv")).desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").cast("int").as("cell"))
      // eager localCheckpoint, not .cache(): the probe list feeds the
      // control-plane collect below AND the candidate join; checkpoint
      // blocks self-release (ContextCleaner) so a serving session calling
      // this repeatedly pins nothing — see the header's caching contract
      .localCheckpoint()
    // control-plane round-trip: ≤ nCells ints prune the partitioned scan
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val scored = idx.filter(col("cell").isin(probedCells: _*))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineFast(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Late-interaction MaxSim RE-RANK over the served IVF shortlist — the
    * ColBERT-style two-stage read path (Khattab & Zaharia 2020): stage 1
    * retrieves `shortlistK` candidates per query by whole-vector cosine
    * from the persisted cell-pruned index ([[annIvfIndexed]], q91's
    * plan, including its partition pruning); stage 2 re-scores ONLY
    * those candidates with the fused [[graft.functions.MaxSimD]]
    * expression over `m` packed subvectors (the multi-vector reading of
    * the fixture's single embedding column) and keeps the top `k`.
    *
    * 100 TB shape: stage 2 touches `shortlistK · |queries|` rows — the
    * shortlist broadcasts INTO one corpus scan (semi-join shaped, the
    * scan prunes on the join), the query vectors broadcast, and the
    * MaxSim loop nest is one whole-stage-codegen projection; re-rank
    * cost is independent of corpus size. The expensive m²·d interaction
    * is paid only on candidates stage 1 already bounded.
    */
  def maxSimRerank(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                   shortlistK: Int, k: Int, m: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val t = Tables(spark, sfDir)
    val short = annIvfIndexed(spark, sfDir, k = shortlistK)
      .select(col("query_id"), col("vec_id"))
    val qv = t.embeddings.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = t.embeddings
      .join(broadcast(short), "vec_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("vec_id"),
        maxsimd(col("qv"), col("embedding"), m).as("ms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ms").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("ms"), 6).as("maxsim"))
  }

  /** The q168 oracle's MaxSim term: per query subvector `i` (constant
    * slice bounds, so the i-sum's order is the generated `+` chain —
    * matching [[graft.functions.MaxSimD]]'s i-ascending accumulation),
    * the max over `m` document subvectors of the sequential dot.
    */
  private[operators] def maxSimSql(qCol: String, dCol: String, m: Int,
                                   dim: Int): String = {
    val sub = dim / m
    (0 until m).map { i =>
      s"""list_max(list_transform(range(0, $m), j ->
            list_dot_product(($qCol[${i * sub + 1} : ${(i + 1) * sub}])::DOUBLE[],
              ($dCol[j * $sub + 1 : j * $sub + $sub])::DOUBLE[])))"""
    }.mkString("(", "\n + ", ")")
  }

  /** KNN self-join (k=1): every vector's nearest neighbor by cosine,
    * bounded to its Voronoi cell (deterministic centroids, q74's cells) —
    * the all-corpus companion of the query-set ANN ops: pairwise work drops
    * from n² to Σ|cell|², and each cell's join is an equi-join on the cell
    * id that AQE can skew-split — MEASURED, not asserted: SimilaritySpec
    * plants a hot cell and gates that the post-execution adaptive plan
    * actually split it (skew=true). Deterministic winner: highest cosine,
    * smallest neighbor id on ties, by `max(struct(cos, -nid))`. Honest
    * plan note (the ArgMax FIND-2 caveat applied here): the struct
    * buffer plans SortAggregate — but its input is the (vec_id, cos,
    * nid) SCALAR triple, the vectors having been consumed by the cosine
    * inside the join, so the per-partition sort is bounded at ~24 B per
    * candidate (q86's cells-∝-n study fits exp 0.31 to 100× —
    * BENCH_sf4_emb2.json). This is categorically unlike the assignment
    * case that died at 100×, where the payload vectors rode the buffer
    * through the sort; a rescoring rewrite here would re-run the pair
    * join (the expensive part) for a sort that is already scalar-cheap.
    * Singleton cells emit nothing (no neighbor exists in-cell).
    */
  def knnJoinInCell(embs: DataFrame, vecCol: String, idCol: String,
                    nCells: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions._
    val cent = embs.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val m = ArgMax.cosModel(cent, "cv", "cid")
    cellPairJoin(embs.select(col(idCol).as("vec_id"),
      ArgMax.argmaxCosine(m, col(vecCol)).as("cell"), col(vecCol).as("v")))
  }

  /** [[knnJoinInCell]] with TWO-LEVEL cell assignment — the configuration a
    * corpus large enough to need `nCells ∝ n` actually runs. Flat
    * assignment scores every vector against every centroid: n·k work, and
    * with k ∝ n (constant expected cell size — the scale rule) that term is
    * n² and dominates long before the Σ|cell|² pair join does (measured:
    * BENCH_sf3's 10×→30× leg bent to ~n² on the flat path). The classic
    * IVF coarse-quantizer fix, composed from the same broadcast-argmax
    * plan shape: assign each vector to one of √k coarse cells (n·√k), then
    * to the best centroid among that coarse cell's children (n·~√k) —
    * n·2√k total, restoring ≈linear growth at constant cell size.
    *
    * Same deterministic seeding as the flat path (first `nCells` vectors by
    * id order; coarse = the first √k of those). The coarse stage is an
    * approximation in the standard IVF sense: a vector whose true nearest
    * centroid hangs under a different coarse cell lands in a neighboring
    * cell, which can change WHICH near-neighbor it pairs with (recall, not
    * correctness — SimilaritySpec gates agreement against the flat path).
    * Centroid-to-coarse routing is model-sized (k·√k) and ties break to the
    * smaller id everywhere, so results are bit-deterministic.
    */
  def knnJoinInCellHier(embs: DataFrame, vecCol: String, idCol: String,
                        nCells: Int = 16): DataFrame = {
    // same seeding as the flat path; the two-level routing itself is the
    // shared index-build primitive ([[EmbeddingIndex.assignCellsHier]] —
    // extracted so the stored cell table and this pair join route
    // through literally one implementation)
    val cent = embs.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    cellPairJoin(EmbeddingIndex.assignCellsHier(embs, cent, vecCol, idCol))
  }

  /** The cells-∝-n sizing rule shared by the auto-scaled cell-bounded
    * ops (q169/q170) and their oracles: k = min(n, max(16,
    * ceil(n / targetCellSize))) — constant EXPECTED cell size, so the
    * Σ|cell|² pair join grows ≈ n·targetCellSize instead of n²/k_fixed
    * (the 30× full-corpus run measured q74/q86's fixed k=16 at ~12–15×
    * for the 3× 10×→30× leg — the expected quadratic; BENCH_sf3.md).
    * The floor of 16 keeps small corpora on the fixed-k baselines'
    * exact cell structure; the min(n, ·) cap makes the derived coarse
    * count match the engine on sub-16-row fixtures.
    */
  private[operators] def autoCellCount(n: Long, targetCellSize: Int): Int =
    math.min(n, math.max(16L, math.ceil(n.toDouble / targetCellSize).toLong))
      .toInt

  /** Deterministic SPREAD centroid seeding for the auto-scaled cell ops:
    * the id range [min, max] splits into `k` equal-width strides and each
    * stride contributes its smallest id — so centroids cover the WHOLE id
    * space instead of its head. First-k-by-id seeding (the fixed-k
    * baselines' rule, kept there for their pinned oracles) degrades
    * structurally when ids correlate with ingest time — all centroids
    * come from the oldest data, so a drifting corpus (new topics, new
    * languages) crowds its later mass into whichever old cells happen to
    * win. Honest measurement note: on the SYNTHETIC replicated corpus the
    * two seedings produce near-identical occupancy (Σ|cell|² 67.7 M
    * first-k vs 68.9 M spread at 30× — that corpus's skew is
    * embedding-space geometry plus hier coarse-stage funneling, which no
    * id-based seeding touches; [[kmeansCentroids]] is the variance
    * reducer when occupancy matters). The spread rule is the right
    * DEFAULT because its failure mode is strictly smaller: it can never
    * be blind to an id region. Cost: two control-plane aggregates and one
    * broadcast semi-join — no sort, no window, nothing corpus-wide moves.
    * Replays in SQL from MIN/MAX/COUNT, so the auto family stays
    * hash-match oracled at any scale. Sparse id ranges may yield < k
    * centroids (empty strides) — both sides derive the coarse stage from
    * the ACTUAL selected count.
    */
  private[operators] def spreadCentroids(embs: DataFrame, vecCol: String,
                                         idCol: String, k: Int): DataFrame = {
    val mm = embs.agg(min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val stride = math.max(1L, (hi - lo + k) / k) // ceil((hi-lo+1)/k)
    // integral DIV (Spark's `/` on longs is double division; DuckDB's
    // `//` on BIGINT is exact — both sides must floor-divide exactly)
    val sel = embs.select(col(idCol).cast("long").as("_id"))
      .groupBy(expr(s"(_id - ${lo}L) DIV ${stride}L").as("bkt"))
      .agg(min(col("_id")).as("cid"))
      .select(col("cid"))
    embs.join(broadcast(sel), col(idCol).cast("long") === col("cid"))
      .select(col("cid"), col(vecCol).as("cv"))
  }

  /** [[knnJoinInCellHier]] with cells ∝ n ([[autoCellCount]]) and
    * [[spreadCentroids]] seeding — the configuration that actually
    * scales: hier assignment is n·2√k (≈ linear with k ∝ n) and the
    * pair join is n·targetCellSize expected with coverage-bounded
    * occupancy. The corpus count is one control-plane aggregate
    * (columnar metadata read); every derived constant (k, the stride,
    * the √k coarse stage) replays in SQL from COUNT/MIN/MAX, so the
    * whole op stays hash-match oracled at ANY scale — the oracle is not
    * pinned to one corpus size.
    */
  def knnJoinInCellAuto(embs: DataFrame, vecCol: String, idCol: String,
                        targetCellSize: Int = 512): DataFrame = {
    val k = autoCellCount(embs.count(), targetCellSize)
    val cent = spreadCentroids(embs, vecCol, idCol, k)
    cellPairJoin(EmbeddingIndex.assignCellsHier(embs, cent, vecCol, idCol))
  }

  /** DuckDB oracle fragment for the AUTO-sized hier cell assignment —
    * [[autoCellCount]] + [[spreadCentroids]] +
    * [[EmbeddingIndex.assignCellsHier]] replayed from first principles:
    * k derives from COUNT(*), centroids are the smallest id of each of k
    * equal-width id strides (stride from MIN/MAX — the spread-seeding
    * rule), coarse = the first ceil(√k') of the SELECTED centroids by id
    * (k' = actual selected count; sparse strides may be empty),
    * centroid→coarse and the two vector routing stages are argmax
    * cosine with ties to the smallest id (ROW_NUMBER cos DESC, id ASC —
    * DuckDB sorts NaN greatest, matching the engine's NaN-greatest
    * contract). Yields `cells(vec_id, cell, embedding)`, the same shape
    * as the flat fragment in [[annIndexedOracleCtes]].
    */
  private[operators] def hierCellsSql(targetCellSize: Int): String =
    s"""nk AS (SELECT LEAST(COUNT(*), GREATEST(16,
                 CAST(CEIL(COUNT(*) / $targetCellSize.0) AS BIGINT))) AS k,
               MIN(vec_id) AS lo, MAX(vec_id) AS hi
               FROM embeddings),
        st AS (SELECT ((hi - lo + k) // k) AS stride FROM nk),
        sel AS (SELECT MIN(e.vec_id) AS scid
                FROM embeddings e
                GROUP BY (e.vec_id - (SELECT lo FROM nk))
                           // (SELECT stride FROM st)),
        centrk AS (SELECT e.vec_id AS cid, e.embedding AS cv,
                     ROW_NUMBER() OVER (ORDER BY e.vec_id) AS rn
                   FROM embeddings e JOIN sel ON sel.scid = e.vec_id),
        cent AS (SELECT cid, cv FROM centrk),
        coarse AS (SELECT cid AS ccid, cv AS ccv FROM centrk
                   WHERE rn <= (SELECT CAST(CEIL(SQRT(COUNT(*) * 1.0))
                                  AS BIGINT) FROM centrk)),
        childof AS (
          SELECT cid, cv, ccid FROM (
            SELECT c.cid, c.cv, cc.ccid,
              ROW_NUMBER() OVER (PARTITION BY c.cid
                ORDER BY list_cosine_similarity(c.cv::DOUBLE[],
                                                cc.ccv::DOUBLE[]) DESC,
                         cc.ccid) AS rn
            FROM cent c CROSS JOIN coarse cc) WHERE rn = 1),
        vcoarse AS (
          SELECT vec_id, ccid, embedding FROM (
            SELECT e.vec_id, cc.ccid, e.embedding,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                                cc.ccv::DOUBLE[]) DESC,
                         cc.ccid) AS rn
            FROM embeddings e CROSS JOIN coarse cc) WHERE rn = 1),
        cells AS (
          SELECT vec_id, cell, embedding FROM (
            SELECT v.vec_id, ch.cid AS cell, v.embedding,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id
                ORDER BY list_cosine_similarity(v.embedding::DOUBLE[],
                                                ch.cv::DOUBLE[]) DESC,
                         ch.cid) AS rn
            FROM vcoarse v JOIN childof ch ON ch.ccid = v.ccid) WHERE rn = 1)"""

  /** Shared Σ|cell|² nearest-neighbor pair join over an assigned
    * (vec_id, cell, v) frame — see [[knnJoinInCell]] for the contract.
    */
  private def cellPairJoin(assigned: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions._
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        struct(cosineFast(col("a.v"), col("b.v")).as("cos"),
          (-col("b.vec_id")).as("nid")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), (-col("best.nid")).as("nn_id"),
        round(col("best.cos"), 6).as("cos_sim"))
  }

  def randomProjection(df: DataFrame, vecCol: String, idCol: String,
                       k: Int = 16, dim: Int = 64): DataFrame = {
    require(k == 16, "scale 1/sqrt(k) must stay exactly representable")
    import graft.functions.VectorFunctions._
    val m = projectionMatrix(k, dim)
    df.select(col(idCol).as("vec_id") +: m.zipWithIndex.map { case (row, i) =>
      (dotd(col(vecCol), typedlit(row)) * 0.25).as(s"p$i")
    }: _*)
  }

  /** DuckDB oracle for q34. The LCG hyperplanes are deterministic literals,
    * so the whole LSH pipeline — per-table sign-bit bucket assignment,
    * multi-table candidate union, cosine rank — is exactly reproducible in
    * SQL: q51's embedded-constants pattern applied to LSH. Shortest-roundtrip
    * `Double.toString` literals parse back to the identical bits, and a sign
    * flip would need |dot| within float-ulp of 0 (never observed on the
    * synthetic corpus).
    */
  private[operators] def q34OracleSql(tables: Int = 24, planes: Int = 4,
                                      dim: Int = 64): String = {
    val hp = hyperplanes(tables, planes, dim)
    def arr(p: Seq[Double]): String = p.mkString("[", ", ", "]")
    val bucketExprs = hp.map { tp =>
      tp.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_inner_product(embedding::DOUBLE[], ${arr(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }
    s"""
      WITH base AS (
        SELECT vec_id, embedding,
               [${bucketExprs.mkString(",\n")}] AS bks
        FROM embeddings
      ),
      cb AS (
        SELECT vec_id, embedding, u.t AS t, bks[u.t + 1] AS b
        FROM base CROSS JOIN range($tables) AS u(t)
      ),
      qb AS (
        SELECT vec_id AS query_id, embedding AS qv, t, b
        FROM cb WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT qb.query_id, cb.vec_id,
               MAX(list_cosine_similarity(qb.qv::DOUBLE[], cb.embedding::DOUBLE[])) AS cos
        FROM cb JOIN qb ON cb.t = qb.t AND cb.b = qb.b AND cb.vec_id <> qb.query_id
        GROUP BY qb.query_id, cb.vec_id
      ),
      ranked AS (
        SELECT query_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id) AS rank
        FROM scored
      )
      SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""
  }

  // ------------------------------------------------------------ query corpus

  /** Shared oracle fragment for the deterministic seed centroids used by
    * every cell-bounded query (q51/q74/q86/q91): the first `n` vectors by
    * id ORDER — the same orderBy/limit seeding as [[annIvf]],
    * [[knnJoinInCell]], [[ivfIndexFor]] and [[Dedup.semanticDedup]], so the
    * SQL stays correct on sparse or non-zero-based ids too.
    */
  private[operators] def centSql(n: Int): String =
    s"""(SELECT vec_id AS cid, embedding AS cv FROM embeddings
                      ORDER BY vec_id LIMIT $n)"""

  /** q91's oracle as a composable CTE FRAGMENT (`cent`/`a`/`cells`/`q`/
    * `p`/`probes`/`scored`/`ranked`; `ranked` carries the per-query
    * rank). `querySql` defines the query set — q91 passes the `vec_id %
    * 100 = 0` fixture; the hybrid-retrieval oracle (q162) passes its
    * literal id list, so fusion ranks through literally this SQL.
    */
  private[operators] def annIndexedOracleCtes(querySql: String,
      nCells: Int = 16, nProbe: Int = 2): String =
    s"""cent AS ${centSql(nCells)},
        a AS (SELECT e.vec_id, c.cid, e.embedding,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM embeddings e CROSS JOIN cent c),
        cells AS (SELECT vec_id, cid AS cell, embedding FROM a WHERE rn = 1),
        q AS ($querySql),
        p AS (SELECT q.query_id, q.qv, c.cid AS cell,
                ROW_NUMBER() OVER (PARTITION BY q.query_id
                  ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM q CROSS JOIN cent c),
        probes AS (SELECT query_id, qv, cell FROM p WHERE rn <= $nProbe),
        scored AS (SELECT pr.query_id, ce.vec_id,
                     list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]) AS cos
                   FROM probes pr JOIN cells ce ON ce.cell = pr.cell
                   WHERE ce.vec_id <> pr.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, vec_id) AS rank
                   FROM scored)"""

  // ------------------------------------------------ product quantization

  /** Product-quantization codebooks (Jégou et al. 2011): the corpus'
    * d-dim vectors split into `m` contiguous subspaces, each L2
    * Lloyd-quantized to `k` codes. All `m` subspaces train in ONE frame —
    * every round is a single assignment+update job over
    * `(vec_id, j, subvector)` rows, not a per-subspace loop — and the
    * codebook state crossing the driver is m·k rows per round
    * (control-plane sized; same policy as [[kmeansCentroids]]). Seeds are
    * the k lowest-id vectors' subvectors (deterministic on any id set).
    * Returns `(j, code, cv)`.
    */
  def pqCodebooks(corpus: DataFrame, vecCol: String, idCol: String,
                  m: Int, k: Int = 16, iters: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions._
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val slices = corpus.select(col(idCol).cast("long").as("vec_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col(vecCol), j * sub + 1, sub).cast("array<double>").as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.sv").as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedIds = corpus.select(col(idCol).cast("long")).orderBy(col(idCol))
      .limit(k).collect().map(_.getLong(0))
    val codeOf = seedIds.sorted.zipWithIndex.toMap
    var cent: Map[(Int, Int), Seq[Double]] = slices
      .filter(col("vec_id").isin(seedIds: _*)).collect()
      .map(r => (r.getInt(1), codeOf(r.getLong(0))) -> r.getSeq[Double](2).toSeq)
      .toMap
    for (_ <- 1 to iters) {
      // map-only keyed argmin over the driver-resident codebooks (the
      // loop state IS a driver map — the old min(struct(d2, code, sv))
      // planned SortAggregate over the n·m·nCodes candidate stream with
      // the sub-vector payload aboard; see ArgMax's scaladoc)
      val m0 = ArgMax.l2ModelOf(cent.toSeq
        .map { case ((j, c), v) => (j.toLong, c.toLong, v.toArray) }
        .sortBy(t => (t._1, t._2)))
      val assigned = slices.select(col("j"),
        ArgMax.argminL2(m0, col("sv"), key = col("j")).cast("int").as("code"),
        col("sv"))
      val means = assigned
        .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("pos", "val")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(avg(col("val").cast(org.apache.spark.sql.types.DecimalType(27, 12)))
          .cast("double").as("mv"))
        .groupBy(col("j"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x.getField("mv")).as("cv"))
      val updated = means.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq).toMap
      cent = cent.map { case (key, old) => key -> updated.getOrElse(key, old) }
    }
    slices.unpersist()
    cent.toSeq.map { case ((j, c), v) => (j, c, v) }
      .sortBy(t => (t._1, t._2)).toDF("j", "code", "cv")
  }

  /** Encode every corpus vector as its per-subspace nearest codes plus its
    * EXACT norm: `(vec_id, codes array<int>, vnorm)`. This is the 100 TB
    * serving artifact — 4·d bytes of floats shrink to m code bytes + one
    * float (64-dim/8-subspace: 264 B → ~16 B), so a billion-vector index
    * fits where the raw vectors cannot; the norm stays exact so only the
    * DOT is approximated downstream.
    */
  def pqEncode(corpus: DataFrame, vecCol: String, idCol: String,
               codebooks: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions._
    // all m per-subspace argmins fused into ONE projection over the
    // collected codebooks (ArgMax.pqCodes): no explode fan-out, no
    // shuffle, no join — encoding is a single pass over the corpus
    val m = ArgMax.l2Model(codebooks, "cv", "code", keyCol = Some("j"))
    corpus.select(col(idCol).cast("long").as("vec_id"),
      norm2(toDense(col(vecCol))).as("vnorm"),
      ArgMax.pqCodes(m, col(vecCol)).as("codes"))
  }

  /** PQ ANN: asymmetric-distance shortlist over the code index, then an
    * exact re-rank of the shortlist — top `k` per query by cosine.
    *
    * Per query the m×`nCodes` table of partial dots `dot(q_j, c_{j,code})`
    * collapses to one broadcast row (`pd: array<array<double>>`); scoring
    * a corpus vector is then m array lookups over its codes — a pure
    * map-side HOF over the code index, no join fan-out and NO access to
    * the float vectors. Only the `shortlist` survivors per query rejoin
    * the raw vectors for the exact-cosine re-rank, which restores the
    * true ranking the quantization blurred. At 100 TB: queries touch the
    * (tiny) code index once and `shortlist/n` of the vector store.
    */
  def annPq(corpus: DataFrame, queries: DataFrame, vecCol: String,
            idCol: String, k: Int, m: Int = 16, nCodes: Int = 32,
            iters: Int = 3, shortlist: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions._
    val cb = pqCodebooks(corpus, vecCol, idCol, m, nCodes, iters)
    val index = pqEncode(corpus, vecCol, idCol, cb)
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val sub = dim / m
    // ADC score: sum of m table lookups; approx cosine divides by the
    // EXACT norms (only the dot is quantized).
    val approx = index.crossJoin(broadcast(pqQueryTables(queries, cb, vecCol, idCol, sub)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adot", adcSum(m))
      .withColumn("acos", col("adot") / (col("vnorm") * col("qnorm")))
    shortlistExact(approx, corpus, queries, vecCol, idCol, k, shortlist)
  }

  /** Per-query ADC lookup tables against codebooks `cb`: one row per query
    * with the m × nCodes partial-dot table `pd` (pd[j][code] =
    * dot(q_subj, codebook(j, code))) and the exact query norm.
    */
  private def pqQueryTables(queries: DataFrame, cb: DataFrame, vecCol: String,
                            idCol: String, sub: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val pd = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(cb))
      .withColumn("pdot", dotd(
        slice(col("qv"), col("j") * sub + 1, lit(sub)), col("cv")))
      .groupBy(col("query_id"), col("j"))
      .agg(transform(array_sort(collect_list(struct(col("code"), col("pdot")))),
        x => x.getField("pdot")).as("row"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("row")))),
        x => x.getField("row")).as("pd"))
    val qn = queries.select(col(idCol).cast("long").as("query_id"),
      norm2(toDense(col(vecCol))).as("qnorm"))
    pd.join(qn, "query_id")
  }

  /** The m ADC table lookups for a `codes` row against the joined `pd` —
    * the codegen'd [[graft.functions.AdcSum]] (the composed triple-HOF
    * form was interpreted per element on the n·|queries| hot path; same
    * fold order, bit-identical sum).
    */
  private def adcSum(m: Int): Column = {
    val _ = m // fused expression reads m from the codes row itself
    org.apache.spark.sql.GraftInterop.column(graft.functions.AdcSum(
      org.apache.spark.sql.GraftInterop.expression(col("codes")),
      org.apache.spark.sql.GraftInterop.expression(col("pd"))))
  }

  /** Shared approximate-score tail: salted two-phase shortlist over an
    * `approx` frame carrying (query_id, vec_id, acos), then exact-cosine
    * re-rank of the survivors to the top k.
    *
    * The salting is [[topKBruteForce]]'s pattern: an unsalted
    * Window.partitionBy(query_id) would funnel the whole corpus-per-query
    * score frame through one reducer partition per query — the
    * giant-partition shape this file exists to avoid. Each salt keeps its
    * own top-`shortlist` (a superset of the global one), then the exact
    * cut runs over shortlist × nSalts survivors.
    */
  private def shortlistExact(approx: DataFrame, corpus: DataFrame,
                             queries: DataFrame, vecCol: String, idCol: String,
                             k: Int, shortlist: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val nSalts = 16
    val saltedS = approx.withColumn("salt",
      pmod(crc32(col("vec_id").cast("string")), lit(nSalts)))
    val ws1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("acos").desc, col("vec_id"))
    val ws2 = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("vec_id"))
    val short = saltedS.withColumn("rn", row_number().over(ws1))
      .filter(col("rn") <= shortlist)
      .withColumn("rn2", row_number().over(ws2))
      .filter(col("rn2") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val vecs = corpus.select(col(idCol).cast("long").as("vec_id"),
      toDense(col(vecCol)).as("v"))
    val qvs = queries.select(col(idCol).cast("long").as("query_id"),
      toDense(col(vecCol)).as("qv"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    short.join(vecs, "vec_id").join(broadcast(qvs), "query_id")
      .withColumn("cos", cosineFast(col("qv"), col("v")))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF-PQ with residual encoding — the production billion-vector layout
    * (FAISS `IVFx,PQy`): a coarse quantizer routes each vector to a cell,
    * PQ codebooks are trained on the RESIDUALS `v − centroid(cell)`
    * (residuals concentrate near the origin, so the same code budget
    * quantizes them with far less error than raw vectors), and a query
    * scores only its `nProbe` probed cells via
    * `dot(q, v) ≈ dot(q, centroid) + Σ_j pd[j][code_j]` — one exact
    * per-probe term plus m table lookups. Composes q51's compute-side
    * pruning (scan nProbe/nCells of the corpus) with q113's memory-side
    * compression (m bytes + one float per vector); the float vectors are
    * touched only for the exact re-rank of the shortlist.
    *
    * 100 TB shape: the cell assignment is the same partially-aggregatable
    * argmax as [[annIvf]] (corpus vectors never shuffle); codebook
    * training/encoding stream through [[pqCodebooks]]/[[pqEncode]] (model
    * crossing the driver = m·nCodes rows); the candidate join is keyed on
    * the probed CELL (broadcast probe list), so serving cost ∝
    * nProbe/nCells of the code index — which at 16 B/vector is the only
    * thing resident. Shortlist + exact re-rank run the salted two-phase
    * cut. Centroids/codebooks are deterministic (seeded), so results are
    * reproducible across partitionings.
    */
  def ivfSeedCentroids(corpus: DataFrame, vecCol: String, idCol: String,
                       nCells: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))

  /** The (vec_id, cell) assignment [[annIvfPq]] routes by — public so its
    * probe SCOPE is inspectable (SimilaritySpec proves every served
    * neighbor lies in a probed cell, and q133's gate scores recall against
    * the truth WITHIN that scope: cell routing on near-random vectors is a
    * documented cost/recall knob, the ADC machinery is what must not lose
    * neighbors). Same argmax + tie-break as the operator's internal
    * assignment.
    */
  def ivfAssignCells(corpus: DataFrame, vecCol: String, idCol: String,
                     cent: DataFrame): DataFrame = {
    val m = ArgMax.cosModel(cent, "cv", "cid")
    corpus.select(col(idCol).cast("long").as("vec_id"),
      ArgMax.argmaxCosine(m, col(vecCol)).as("cell"))
  }

  /** Each query's `nProbe` nearest cells under `cent` — [[annIvfPq]]'s
    * probe list, exposed for scope inspection (see [[ivfAssignCells]]).
    */
  def ivfProbeCells(queries: DataFrame, cent: DataFrame, vecCol: String,
                    idCol: String, nProbe: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(cent))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(cosineFast(col("qv"), col("cv")).desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
  }

  def annIvfPq(corpus: DataFrame, queries: DataFrame, vecCol: String,
               idCol: String, k: Int, nCells: Int = 8, nProbe: Int = 3,
               m: Int = 16, nCodes: Int = 32, iters: Int = 3,
               shortlist: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val sub = dim / m
    val cent = ivfSeedCentroids(corpus, vecCol, idCol, nCells)
    // Nearest-centroid assignment (argmax cosine, ties to smaller cid —
    // map-only over the collected model) + residual against the winning
    // centroid + the EXACT original norm. Eager localCheckpoint, not
    // .cache(): the residual frame is corpus-sized and feeds codebook
    // training, encoding and the serving join — checkpoint blocks
    // self-release via ContextCleaner when this call returns, so a
    // long-lived serving session calling annIvfPq repeatedly pins
    // nothing (the session caching contract in this file's header).
    val am = ArgMax.cosModel(cent, "cv", "cid")
    val resid = corpus
      .select(col(idCol).cast("long").as("vec_id"),
        ArgMax.argmaxCosine(am, col(vecCol)).as("cell"), col(vecCol).as("v"))
      .join(broadcast(cent.select(col("cid").as("cell"),
        col("cv").as("ccv"))), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v").cast("array<double>"), col("ccv"),
          (a, b) => a - b).as("resid"),
        norm2(toDense(col("v"))).as("vnorm"))
      .localCheckpoint()
    val cb = pqCodebooks(resid, "resid", "vec_id", m, nCodes, iters)
    val index = pqEncode(resid, "resid", "vec_id", cb)
      .select(col("vec_id"), col("codes"))
      .join(resid.select(col("vec_id"), col("cell"), col("vnorm")), "vec_id")
    // Probe list with the exact query·centroid dot per probed cell.
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(cent))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(cosineFast(col("qv"), col("cv")).desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"),
        dotd(col("qv"), col("cv")).as("qcdot"))
    val approx = index
      .join(broadcast(probes.join(pqQueryTables(queries, cb, vecCol, idCol, sub),
        "query_id")), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adot", col("qcdot") + adcSum(m))
      .withColumn("acos", col("adot") / (col("vnorm") * col("qnorm")))
    shortlistExact(approx, corpus, queries, vecCol, idCol, k, shortlist)
  }

  val queries: Seq[Query] = Seq(

    // Exact k-NN for every 100th vector (deterministic query set).
    Query(
      "q33_ann_bruteforce",
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                   WHERE vec_id % 100 = 0),
        scored AS (SELECT query_id, e.vec_id,
                     list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) AS cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id) AS rank
                   FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
        SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      topKBruteForce(t.embeddings, qs, "embedding", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN with a full exact oracle: the deterministic
    // hyperplanes are embedded in the generated SQL (see q34OracleSql).
    // Recall vs q33 is additionally gated >= 0.8 in SimilaritySpec.
    Query("q34_ann_lsh", Some(q34OracleSql()))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      annLsh(t.embeddings, qs, "embedding", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF ANN: deterministic centroids make the cells (and therefore the
    // whole result) exactly reproducible in SQL — a full hash-match oracle,
    // unlike LSH's recall-style check.
    Query(
      "q51_ann_ivf",
      Some(s"""
        WITH cent AS ${centSql(16)},
        a AS (SELECT e.vec_id, c.cid, e.embedding,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM embeddings e CROSS JOIN cent c),
        cells AS (SELECT vec_id, cid AS cell, embedding FROM a WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
              WHERE vec_id % 100 = 0),
        p AS (SELECT q.query_id, q.qv, c.cid AS cell,
                ROW_NUMBER() OVER (PARTITION BY q.query_id
                  ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM q CROSS JOIN cent c),
        probes AS (SELECT query_id, qv, cell FROM p WHERE rn <= 2),
        scored AS (SELECT pr.query_id, ce.vec_id,
                     list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]) AS cos
                   FROM probes pr JOIN cells ce ON ce.cell = pr.cell
                   WHERE ce.vec_id <> pr.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      annIvf(t.embeddings, qs, "embedding", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Filtered vector search: per-query top-k restricted to corpus vectors
    // whose label MATCHES the query's — the tenant/language/label filter
    // every production retrieval stack needs. The filter is part of the
    // candidate-join KEY (cell, label), not a post-filter of an unfiltered
    // top-k (which silently under-returns) nor an unfiltered cell scan
    // (which wastes the probe). Deterministic centroids again make the
    // whole result SQL-reproducible — a full hash-match oracle.
    Query(
      "q122_ann_filtered",
      Some(s"""
        WITH cent AS ${centSql(16)},
        a AS (SELECT e.vec_id, e.label, c.cid, e.embedding,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM embeddings e CROSS JOIN cent c),
        cells AS (SELECT vec_id, label, cid AS cell, embedding FROM a WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, label, embedding AS qv FROM embeddings
              WHERE vec_id % 100 = 0),
        p AS (SELECT q.query_id, q.label, q.qv, c.cid AS cell,
                ROW_NUMBER() OVER (PARTITION BY q.query_id
                  ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM q CROSS JOIN cent c),
        probes AS (SELECT query_id, label, qv, cell FROM p WHERE rn <= 2),
        scored AS (SELECT pr.query_id, ce.vec_id,
                     list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]) AS cos
                   FROM probes pr JOIN cells ce
                     ON ce.cell = pr.cell AND ce.label = pr.label
                   WHERE ce.vec_id <> pr.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      annIvf(t.embeddings, qs, "embedding", "vec_id", k = 5,
          matchCol = Some("label"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // K-means IVF with a recall-property oracle: the estimator output is
    // data-adapted (so no literal-embedding trick applies), but the
    // checkable contract is recall against exact top-k — and q33 proves the
    // Spark brute force IS DuckDB's exact answer (full hash match). Each
    // query row asserts >= 2 of its exact top-5 were found through 8 of 16
    // k-means cells; the oracle expects every flag TRUE. (The synthetic
    // embeddings are nearly unclustered, which caps IVF recall around the
    // probed-cell fraction — measured worst-per-query is 0.6 at sf0.1 and
    // 0.8 at sf0.01, so the 0.4 floor has 1.5-2x margin.)
    Query(
      "q53_ann_ivf_kmeans",
      Some("""
        SELECT vec_id AS query_id, TRUE AS recall_ok
        FROM embeddings WHERE vec_id % 100 = 0
        ORDER BY query_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      val cent = kmeansCentroids(t.embeddings, "embedding", "vec_id", k = 16, iters = 3)
      val ann = annIvf(t.embeddings, qs, "embedding", "vec_id", k = 5,
        nProbe = 8, centroids = Some(cent))
      val truth = topKBruteForce(t.embeddings, qs, "embedding", "vec_id", k = 5)
      truth.as("t").join(ann.as("a"),
          col("t.query_id") === col("a.query_id") &&
            col("t.vec_id") === col("a.vec_id"), "left")
        .groupBy(col("t.query_id").as("query_id"))
        .agg((count(col("a.vec_id")) >= 2).as("recall_ok"))
        .orderBy(col("query_id"))
    }),

    // Product-quantization ANN, recall-gated against brute-force truth
    // (q53's self-certifying pattern: the engine computes recall in-plan,
    // the oracle pins every gate TRUE). Codes are 16 bytes/vector vs 264
    // raw — the memory-side scale technique complementing IVF's
    // compute-side pruning. Shortlist 64 of ~500, exact re-rank to top 5;
    // gate ≥ 3 of 5 (this config measures a full 5/5 on every sf0.01
    // query — the near-random synthetic embeddings are the hard case, and
    // smaller codebooks (m=8, 16 codes) dropped to 2/5).
    Query(
      "q113_ann_pq",
      Some("""
        SELECT vec_id AS query_id, TRUE AS recall_ok
        FROM embeddings WHERE vec_id % 100 = 0
        ORDER BY query_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      val pq = annPq(t.embeddings, qs, "embedding", "vec_id", k = 5,
        m = 16, nCodes = 32, iters = 3, shortlist = 64)
      val truth = topKBruteForce(t.embeddings, qs, "embedding", "vec_id", k = 5)
      truth.as("t").join(pq.as("a"),
          col("t.query_id") === col("a.query_id") &&
            col("t.vec_id") === col("a.vec_id"), "left")
        .groupBy(col("t.query_id").as("query_id"))
        .agg((count(col("a.vec_id")) >= 3).as("recall_ok"))
        .orderBy(col("query_id"))
    }),

    // IVF-PQ with residual encoding (FAISS IVFx,PQy): coarse cells prune
    // the scan to nProbe/nCells, PQ codes over RESIDUALS compress what
    // remains, score = exact q·centroid + m ADC lookups, exact re-rank of
    // the shortlist. Self-certifying recall gate, scoped to the PROBED
    // cells: on the near-random synthetic embeddings cell membership
    // carries little signal, so GLOBAL recall of any nProbe < nCells
    // routing is a coin flip by construction (q113 covers global recall
    // by scanning everything) — what q133 must prove is that the
    // residual-ADC machinery finds the true neighbors WITHIN its probe
    // scope. Truth = brute-force top-5 restricted to the query's probed
    // cells (the same public assignment the operator routes by); gate
    // >= 3 of 5.
    Query(
      "q133_ann_ivfpq",
      Some("""
        SELECT vec_id AS query_id, TRUE AS recall_ok
        FROM embeddings WHERE vec_id % 100 = 0
        ORDER BY query_id"""))((spark, dir) => {
      import graft.functions.VectorFunctions._
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      val ann = annIvfPq(t.embeddings, qs, "embedding", "vec_id", k = 5,
        nCells = 8, nProbe = 3, m = 16, nCodes = 32, iters = 3,
        shortlist = 64)
      // probed-scope truth via the operator's own public routing
      val cent = ivfSeedCentroids(t.embeddings, "embedding", "vec_id", 8)
      val cells = ivfAssignCells(t.embeddings, "embedding", "vec_id", cent)
      val probes = ivfProbeCells(qs, cent, "embedding", "vec_id", nProbe = 3)
      val vecs = t.embeddings.select(col("vec_id").cast("long").as("vec_id"),
        toDense(col("embedding")).as("v"))
      val qvs = qs.select(col("vec_id").cast("long").as("query_id"),
        toDense(col("embedding")).as("qv"))
      val wt = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val truth = probes.join(cells, "cell")
        .filter(col("vec_id") =!= col("query_id"))
        .join(vecs, "vec_id").join(broadcast(qvs), "query_id")
        .withColumn("cos", cosineFast(col("qv"), col("v")))
        .withColumn("rn", row_number().over(wt))
        .filter(col("rn") <= 5)
      truth.as("t").join(ann.as("a"),
          col("t.query_id") === col("a.query_id") &&
            col("t.vec_id") === col("a.vec_id"), "left")
        .groupBy(col("t.query_id").as("query_id"))
        .agg((count(col("a.vec_id")) >= 3).as("recall_ok"))
        .orderBy(col("query_id"))
    }),

    // Random projection with a full exact oracle: the LCG matrix rows are
    // embedded as SQL literals (q34's pattern), and the 1/sqrt(16) = 0.25
    // scale is exactly representable, so every projected coordinate
    // hash-matches. First 4 of the 16 components are emitted.
    Query(
      "q57_random_projection", {
        val m = projectionMatrix(16, 64)
        def arr(p: Seq[Double]): String = p.mkString("[", ", ", "]")
        Some(s"""
          SELECT vec_id,
                 ${(0 until 4).map(i =>
                   s"round(list_inner_product(embedding::DOUBLE[], ${arr(m(i))}) * 0.25, 6) AS p$i")
                   .mkString(",\n")}
          FROM embeddings WHERE vec_id % 50 = 0
          ORDER BY vec_id""")
      })((spark, dir) => {
      val t = Tables(spark, dir)
      randomProjection(t.embeddings.filter(col("vec_id") % 50 === 0),
          "embedding", "vec_id")
        .select(col("vec_id") +: (0 until 4).map(i => round(col(s"p$i"), 6).as(s"p$i")): _*)
        .orderBy(col("vec_id"))
    }),

    // KNN self-join (k=1) bounded to deterministic Voronoi cells — the
    // all-corpus nearest-neighbor table, fully hash-match oracled (q74's
    // cells fragment + a windowed argmax with the same tie-break).
    Query(
      "q86_knn_join",
      Some(s"""
        WITH cent AS ${centSql(16)},
        a AS (SELECT e.vec_id, c.cid, e.embedding,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                           c.cid) AS rn
              FROM embeddings e CROSS JOIN cent c),
        cells AS (SELECT vec_id, cid AS cell, embedding FROM a WHERE rn = 1),
        nn AS (SELECT x.vec_id, y.vec_id AS cand,
                      list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cs
               FROM cells x JOIN cells y
                 ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        best AS (SELECT vec_id, cand, cs,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY cs DESC, cand) AS rn
                 FROM nn)
        SELECT vec_id, cand AS nn_id, round(cs, 6) AS cos_sim
        FROM best WHERE rn = 1
        ORDER BY vec_id"""))((spark, dir) => {
      knnJoinInCell(Tables(spark, dir).embeddings, "embedding", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // q86's scale-path twin: cells ∝ n (target expected cell ≈ 512) with
    // two-level hier assignment — the configuration whose pair join grows
    // ≈ n·512 instead of q86's n²/16 (the 30× run measured the fixed-k
    // form at ~12× for a 3× leg). k and the √k coarse stage both derive
    // from COUNT(*) in the oracle, so the hash-match holds at any corpus
    // size, and the previously spec-only hier routing is now oracled.
    Query(
      "q170_knn_join_auto",
      Some(s"""
        WITH ${hierCellsSql(512)},
        nn AS (SELECT x.vec_id, y.vec_id AS cand,
                      list_cosine_similarity(x.embedding::DOUBLE[],
                                             y.embedding::DOUBLE[]) AS cs
               FROM cells x JOIN cells y
                 ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        best AS (SELECT vec_id, cand, cs,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY cs DESC, cand) AS rn
                 FROM nn)
        SELECT vec_id, cand AS nn_id, round(cs, 6) AS cos_sim
        FROM best WHERE rn = 1
        ORDER BY vec_id"""))((spark, dir) => {
      knnJoinInCellAuto(Tables(spark, dir).embeddings, "embedding", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // Persisted-index IVF serving: same answer as q51 (the oracle is the
    // identical SQL) through an on-disk cell-partitioned index whose scan
    // is dynamically pruned to the probed cells.
    Query(
      "q91_ann_indexed",
      Some(s"""
        WITH ${annIndexedOracleCtes(
          """SELECT vec_id AS query_id, embedding AS qv FROM embeddings
             WHERE vec_id % 100 = 0""")}
        SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) =>
      annIvfIndexed(spark, dir, k = 5).orderBy(col("query_id"), col("rank"))),

    // Late-interaction MaxSim re-rank of the served IVF shortlist
    // (ColBERT two-stage read): stage 1 = q91's index-served cosine
    // top-20, stage 2 = MaxSimD over m=4 packed subvectors, top-5. The
    // oracle composes q91's CTE fragment (shortlist ranks through
    // literally that SQL) with the per-term maxsim arithmetic — dots,
    // max, i-order sum all replayed bit-exactly.
    Query(
      "q168_maxsim_rerank",
      Some(s"""
        WITH ${annIndexedOracleCtes(
          """SELECT vec_id AS query_id, embedding AS qv FROM embeddings
             WHERE vec_id % 100 = 0""")},
        short AS (SELECT query_id, vec_id FROM ranked WHERE rank <= 20),
        qvs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id % 100 = 0),
        ms AS (SELECT s.query_id, s.vec_id,
                 ${maxSimSql("q.qv", "e.embedding", m = 4, dim = 64)} AS ms
               FROM short s
               JOIN embeddings e ON e.vec_id = s.vec_id
               JOIN qvs q ON q.query_id = s.query_id),
        rr AS (SELECT query_id, vec_id, ms,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY ms DESC, vec_id) AS rank
               FROM ms)
        SELECT query_id, rank, vec_id, round(ms, 6) AS maxsim
        FROM rr WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) =>
      maxSimRerank(spark, dir, shortlistK = 20, k = 5, m = 4)
        .orderBy(col("query_id"), col("rank"))),

    // Per-label embedding centroids (mean-pooling — the class-prototype
    // vector aggregate): posexplode to (label, dim) cells, one
    // map-side-combinable shuffle, sums routed through DECIMAL(30,15) so
    // the centroid is exact at any partition count. Long-form output
    // (label, pos, mean) — first 8 dims.
    Query(
      "q99_label_centroids",
      Some("""
        WITH u AS (SELECT label, unnest(range(0, 8)) AS pos, embedding
                   FROM embeddings)
        SELECT label, pos, COUNT(*) AS n,
               round(CAST(SUM(CAST(CAST(embedding[pos + 1] AS DOUBLE)
                 AS DECIMAL(30,15))) AS DOUBLE) / COUNT(*), 6) AS mean_x
        FROM u GROUP BY label, pos
        ORDER BY label, pos"""))((spark, dir) => {
      val d = org.apache.spark.sql.types.DecimalType(30, 15)
      Tables(spark, dir).embeddings
        .select(col("label"), posexplode(slice(col("embedding"), 1, 8)))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("col").cast("double").cast(d)).cast("double")
            / count(lit(1)), 6).as("mean_x"))
        .orderBy(col("label"), col("pos"))
    })
  )
}
