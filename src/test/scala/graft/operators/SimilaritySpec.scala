package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val embs = Tables(spark, sf("sf0.001")).embeddings.cache()
  private lazy val qs = embs.filter(col("vec_id") % 50 === 0)

  test("two-phase brute-force top-k equals naive single-window top-k") {
    val twoPhase = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val naive = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5, nSalts = 1)
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(twoPhase == naive)
  }

  test("LSH ANN: recall@5 vs brute force is >= 0.8 at tuned defaults") {
    val brute = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val ann = Similarity.annLsh(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val recall = if (brute.isEmpty) 1.0 else (ann intersect brute).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.3f (${ann.size} returned)")
    assert(recall >= 0.8, f"recall $recall%.3f below the 0.8 gate")
  }

  test("annLsh refuses past its bucket-collision bound, naming the indexed path") {
    // the batch-LSH contract class: fixed-width buckets make candidates
    // quadratic when queries grow with the corpus; the guard reads two
    // tiny (table, bucket) histograms, never the vectors
    val ex = intercept[graft.util.ContractRefusal] {
      Similarity.annLsh(embs, qs, "embedding", "vec_id", k = 5,
        maxCandEstimate = 1L).count()
    }
    assert(ex.getMessage.contains("annIvfIndexed"), ex.getMessage)
    assert(ex.getMessage.contains("bucket-collision"), ex.getMessage)
  }

  test("IVF ANN: per-query results bounded by k, ranks contiguous, recall nontrivial") {
    val brute = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val ivf = Similarity.annIvf(embs, qs, "embedding", "vec_id", k = 5)
    val rows = ivf.select("query_id", "rank", "vec_id").collect()
    val byQuery = rows.groupBy(_.get(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q returned ${rs.length} > k rows")
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length),
        s"query $q ranks not contiguous from 1")
    }
    val got = rows.map(r => (r.get(0), r.get(2))).toSet
    val recall = if (brute.isEmpty) 1.0 else (got intersect brute).size.toDouble / brute.size
    info(f"IVF recall@5 (nProbe=2/16 cells) = $recall%.3f")
    assert(recall >= 0.2, f"recall $recall%.3f too low")
  }

  test("k-means seeding is the first k of the id ORDER, not ids < k") {
    // same corpus, every id shifted by 5000: a `vec_id < k` seed would find
    // ZERO seeds; first-k-by-order must produce the identical clustering
    // (cosine and tie ordering are shift-invariant), cids shifted along.
    val shifted = embs.select((col("vec_id") + 5000).as("vec_id"), col("embedding"))
    val base = Similarity.kmeansCentroids(embs, "embedding", "vec_id", k = 16, iters = 2)
      .collect().map(r => (r.getLong(0) + 5000L) -> r.getSeq[Double](1).toSeq).toMap
    val moved = Similarity.kmeansCentroids(shifted, "embedding", "vec_id", k = 16, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(moved.size == 16)
    assert(moved == base)
  }

  test("sparse/shifted ids: annIvf, knnJoinInCell and the persisted index seed by id order") {
    // Same corpus with every id shifted by 5000: a `vec_id < nCells` seed
    // rule would find ZERO centroids. All three cell-bounded paths must
    // produce the identical answer with ids shifted along (cosine and tie
    // ordering are shift-invariant).
    val shifted = embs.select((col("vec_id") + 5000).as("vec_id"),
      col("embedding"), col("label"))
    val qsS = shifted.filter(col("vec_id") % 50 === 0) // same rows as qs, shifted
    def keyed(df: org.apache.spark.sql.DataFrame, shift: Long, ids: Seq[String]) =
      df.select(df.columns.map(c =>
        if (ids.contains(c)) (col(c) - shift).as(c) else col(c)).toIndexedSeq: _*)
        .collect().map(_.toString).toSet

    val baseIvf = keyed(Similarity.annIvf(embs, qs, "embedding", "vec_id", k = 5),
      0, Seq("query_id", "vec_id"))
    val shiftIvf = keyed(Similarity.annIvf(shifted, qsS, "embedding", "vec_id", k = 5),
      5000, Seq("query_id", "vec_id"))
    assert(baseIvf.nonEmpty && shiftIvf == baseIvf)

    val baseKnn = keyed(Similarity.knnJoinInCell(embs, "embedding", "vec_id"),
      0, Seq("vec_id", "nn_id"))
    val shiftKnn = keyed(Similarity.knnJoinInCell(shifted, "embedding", "vec_id"),
      5000, Seq("vec_id", "nn_id"))
    assert(baseKnn.nonEmpty && shiftKnn == baseKnn)

    // the PERSISTED index path (ivfIndexFor/annIvfIndexed) reads its corpus
    // from a directory — build one holding the shifted embeddings
    val tmp = java.nio.file.Files.createTempDirectory("graft-sparse-ivf").toString
    graft.Tables(spark, sf("sf0.001")).embeddings
      .withColumn("vec_id", col("vec_id") + 5000)
      .write.parquet(s"$tmp/embeddings.parquet")
    val baseIdx = keyed(Similarity.annIvfIndexed(spark, sf("sf0.001"), k = 5),
      0, Seq("query_id", "vec_id"))
    val shiftIdx = keyed(Similarity.annIvfIndexed(spark, tmp, k = 5),
      5000, Seq("query_id", "vec_id"))
    assert(baseIdx.nonEmpty && shiftIdx == baseIdx)
  }

  test("k-means centroids beat first-N centroids on IVF recall") {
    val brute = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.get(0), r.get(1))).toSet
    def recallOf(cent: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = Similarity.annIvf(embs, qs, "embedding", "vec_id", k = 5,
          centroids = cent)
        .select("query_id", "vec_id").collect().map(r => (r.get(0), r.get(1))).toSet
      if (brute.isEmpty) 1.0 else (got intersect brute).size.toDouble / brute.size
    }
    val km = Similarity.kmeansCentroids(embs, "embedding", "vec_id", k = 16, iters = 3)
    val (rFirst, rKm) = (recallOf(None), recallOf(Some(km)))
    info(f"IVF recall@5: first-16 = $rFirst%.3f, k-means = $rKm%.3f")
    assert(rKm >= rFirst, f"k-means recall $rKm%.3f below first-N $rFirst%.3f")
  }

  test("hierarchical cell KNN: deterministic, near-full coverage, flat-grade neighbors") {
    def run(f: => org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      f.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val flat = run(Similarity.knnJoinInCell(embs, "embedding", "vec_id", nCells = 16))
    val hier = run(Similarity.knnJoinInCellHier(embs, "embedding", "vec_id", nCells = 16))
    // bit-deterministic across runs (broadcast argmax, smaller-id ties)
    val again = run(Similarity.knnJoinInCellHier(embs, "embedding", "vec_id", nCells = 16))
    assert(hier == again)
    // the coarse stage only re-routes vectors near cell boundaries: almost
    // every vector still gets an in-cell neighbor...
    assert(hier.size >= (flat.size * 0.9).toInt,
      s"hier emitted ${hier.size} of flat's ${flat.size}")
    // ...and the neighbors it finds are flat-grade CLOSE. (Neighbor
    // IDENTITY is the wrong gate on this corpus: cosines to all 16 seed
    // centroids are nearly equal on near-uniform synthetic embeddings, so
    // the cell argmax — and hence which same-quality neighbor wins — is
    // boundary-noise. What the approximation must preserve is how close
    // the found neighbor is.)
    val common = flat.keySet intersect hier.keySet
    def meanCos(m: Map[Long, (Long, Double)]) =
      common.iterator.map(id => m(id)._2).sum / common.size
    val (mf, mh) = (meanCos(flat), meanCos(hier))
    info(f"mean nn cosine: flat = $mf%.4f, hier = $mh%.4f over ${common.size} vectors")
    assert(mh >= mf - 0.02, f"hier neighbor quality $mh%.4f well below flat $mf%.4f")
  }

  test("auto-sized cell KNN: sizing rule, floor equivalence, k growth") {
    // the cells-∝-n sizing rule the auto ops and their oracles share
    assert(Similarity.autoCellCount(500, 512) == 16)   // floor
    assert(Similarity.autoCellCount(2000, 512) == 16)  // still floor
    assert(Similarity.autoCellCount(60000, 512) == 118)
    assert(Similarity.autoCellCount(8, 512) == 8)      // capped at n
    def run(f: => org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      f.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // spread seeding: one centroid per occupied id stride, covering the
    // whole id range (not its head, the fixed-k baselines' seeding)
    val cent = Similarity.spreadCentroids(embs, "embedding", "vec_id", 16)
      .collect().map(_.getLong(0)).sorted
    assert(cent.length == 16, cent.toSeq.toString)
    val maxId = embs.agg(max(col("vec_id"))).head().getLong(0)
    assert(cent.last > maxId / 2, s"centroids bunched at the head: ${cent.toSeq}")
    // bit-deterministic across runs (broadcast argmax, smaller-id ties)
    val auto = run(Similarity.knnJoinInCellAuto(embs, "embedding", "vec_id"))
    val again = run(Similarity.knnJoinInCellAuto(embs, "embedding", "vec_id"))
    assert(auto == again)
    // a smaller target drives k past the floor and stays deterministic
    val fine = run(Similarity.knnJoinInCellAuto(embs, "embedding", "vec_id",
      targetCellSize = 24))
    assert(fine == run(Similarity.knnJoinInCellAuto(embs, "embedding",
      "vec_id", targetCellSize = 24)))
  }

  test("product quantization: code shape, determinism, shortlist recall") {
    import org.apache.spark.sql.functions._
    val embs = graft.Tables(spark, sf("sf0.01")).embeddings
    val m = 16; val nCodes = 32
    val cb = Similarity.pqCodebooks(embs, "embedding", "vec_id", m, nCodes, iters = 2)
    // full codebook grid, one centroid per (subspace, code), right dims
    val rows = cb.collect()
    assert(rows.length == m * nCodes)
    assert(rows.forall(_.getSeq[Double](2).length == 64 / m))
    val index = Similarity.pqEncode(embs, "embedding", "vec_id", cb)
    val codes = index.collect()
    assert(codes.length == embs.count())
    assert(codes.forall { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      cs.length == m && cs.forall(c => c >= 0 && c < nCodes)
    })
    // deterministic under repartitioning (hash-free pipeline end-to-end)
    val qs = embs.filter(col("vec_id") % 100 === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.annPq(c, qs, "embedding", "vec_id", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(embs)
    assert(a == run(embs.repartition(13)))
    // ADC shortlist + exact re-rank recovers brute-force truth: >= 3 of 5
    // per query on the near-random synthetic corpus (q113 gates the same)
    val truth = Similarity.topKBruteForce(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQ = truth.groupBy(_._1).map { case (q, ts) => (ts intersect a).size }
    assert(perQ.forall(_ >= 3), s"recall dipped: $perQ")
  }

  test("IVF-PQ: neighbors stay inside probed cells; probed-scope recall holds; deterministic") {
    import org.apache.spark.sql.functions._
    val embs = graft.Tables(spark, sf()).embeddings
    val qs = embs.filter(col("vec_id") % 100 === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.annIvfPq(c, qs, "embedding", "vec_id", k = 5,
          nCells = 8, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(embs)
    assert(a == run(embs.repartition(13)) && a.nonEmpty)
    // containment: the q133 probed-scope gate is only meaningful if the
    // operator really serves from the cells the PUBLIC routing reports
    val cent = Similarity.ivfSeedCentroids(embs, "embedding", "vec_id", 8)
    val cells = Similarity.ivfAssignCells(embs, "embedding", "vec_id", cent)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = Similarity.ivfProbeCells(qs, cent, "embedding", "vec_id", 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(a.forall { case (q, v) => probed(q).contains(cells(v)) },
      "a served neighbor lies outside its query's probed cells")
    // probed-scope recall: within each query's OWN probed cells, the
    // residual-ADC path must recover the scoped brute-force truth
    // (driver-side reference — the sf0.001 corpus is tiny)
    val vecsArr = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
    val vmap = vecsArr.toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var (d, nx, ny, i) = (0.0, 0.0, 0.0, 0)
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    probed.foreach { case (q, pcells) =>
      val truth = vecsArr
        .filter { case (v, _) => v != q && pcells.contains(cells(v)) }
        .sortBy { case (v, xv) => (-cos(vmap(q), xv), v) }
        .take(5).map(_._1).toSet
      val gotQ = a.filter(_._1 == q).map(_._2)
      assert((truth intersect gotQ).size >= 3,
        s"probed-scope recall dipped for query $q: ${(truth intersect gotQ).size}")
    }
  }

  test("filtered ANN: every neighbor carries the query's label; the filter bites") {
    import org.apache.spark.sql.functions._
    val embs = graft.Tables(spark, sf()).embeddings
    val qs = embs.filter(col("vec_id") % 100 === 0)
    val got = Similarity.annIvf(embs, qs, "embedding", "vec_id", k = 5,
      matchCol = Some("label"))
    val labels = embs.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, v) => labels(q) == labels(v) },
      "a neighbor crossed the label filter")
    // the unfiltered result must differ (some top-k neighbors have other
    // labels on this corpus) — otherwise the case proves nothing
    val unfiltered = Similarity.annIvf(embs, qs, "embedding", "vec_id", k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet != unfiltered)
  }

  /** The cell-join docstrings claim the Σ|cell|² pair join is
    * "AQE-skew-splittable" — this gates it instead of asserting it. One
    * planted hot cell (a dense cluster), thresholds scaled to spec data
    * volume, and the POST-EXECUTION adaptive plan must show the skewed
    * partition actually split (skew=true on the join /
    * AQEShuffleRead skewed) — the runtime fix a production hot Voronoi
    * cell relies on.
    */
  test("cell pair join: a planted hot cell triggers AQE skew-join splitting") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val rnd = new scala.util.Random(7L)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    // 3000 vectors piled on one direction (ids AFTER the seeds so the
    // first-16 seeding can't split the pile), 60 spread elsewhere
    val seeds = (0L until 16L).map { i =>
      (i, unit(Array.tabulate(8)(j => if (j == (i % 8).toInt) 1.0 else 0.02 * rnd.nextGaussian())))
    }
    val hot = (100L until 3100L).map { i =>
      (i, unit(Array.tabulate(8)(j =>
        (if (j == 0) 1.0 else 0.0) + 0.01 * rnd.nextGaussian())))
    }
    val cold = (5000L until 5060L).map { i =>
      (i, unit(Array.fill(8)(rnd.nextGaussian())))
    }
    val embs = (seeds ++ hot ++ cold).toDF("vec_id", "embedding")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> (try Option(conf.get(k)) catch { case _: Throwable => None }))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // the spec corpus is broadcast-sized; production cell tables are
      // not — force the shuffled join the claim is about
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults (256 MB / 5×) scaled to spec volume: the hot
      // cell's partition is ~100 KB here
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20000")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10000")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val df = Similarity.knnJoinInCell(embs, "embedding", "vec_id", nCells = 16)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val s = plan.toString
      assert(s.contains("skew=true") || s.contains("AQEShuffleRead skewed"),
        "hot cell did not trigger AQE skew splitting:\n" + s.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
  test("serving calls pin no storage blocks (session caching contract)") {
    // annIvfPq / annIvfIndexed use eager localCheckpoint (self-releasing
    // via ContextCleaner), never cache(): after a serving call returns,
    // the SQL cache manager must hold nothing — a long-lived serving
    // session calling these repeatedly must not accumulate pinned
    // corpus-sized blocks (the round-11 hygiene finding)
    spark.catalog.clearCache()
    val e = graft.Tables(spark, sf("sf0.001")).embeddings
    val qs = e.filter(col("vec_id") % 100 === 0)
    Similarity.annIvfPq(e, qs, "embedding", "vec_id", k = 3,
      nCells = 4, nProbe = 2, m = 8, nCodes = 8, iters = 1,
      shortlist = 16).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "annIvfPq left entries in the SQL cache manager")
    Similarity.annIvfIndexed(spark, sf("sf0.001"), k = 3).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "annIvfIndexed left entries in the SQL cache manager")
  }
}
