package graft.operators

import graft.functions.{NearestId, NearestModel, PqEncodeCodes}
import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.functions._

/** Nearest-candidate argmax/argmin — the single authority for how every
  * cell/code assignment in the engine selects its winner.
  *
  * THE SEMANTICS (shared by every form below): score each (row,
  * candidate) pair, take the extreme score (max cosine / min L2), ties
  * resolve to the SMALLEST candidate id, NaN scores order GREATEST —
  * identical to the one-pass `max(struct(score, -id))` idiom under any
  * partitioning.
  *
  * THE FORMS, in preference order:
  *
  *  1. [[argmaxCosine]] / [[argminL2]] / [[pqCodes]] — the candidate set
  *     collected to a [[NearestModel]] and the whole argmax evaluated as
  *     ONE whole-stage-codegen projection ([[graft.functions.NearestId]]):
  *     no candidate join, no aggregate, no join-back, zero shuffles. This
  *     is the default: the candidate side here is ALWAYS model-sized
  *     (IVF centroids, PQ codebooks — the same frames the k-means loops
  *     collect each round and the quantizer digests already collect), so
  *     the collect is a control-plane round-trip and the model ships once
  *     per stage inside the (Spark-broadcast) task binary. A per-row
  *     expression also cannot drop a key group — the silent-loss edge the
  *     rescoring form's invariant note below guards against. Measured at
  *     the 100× build study point (200 k vectors × 1600 cells,
  *     BENCH_sf4_build2.json): the flat IVF build drops 20.1 s
  *     (rescoring form) → **1.04 s**, hier 2.81 s → 0.63 s, and the
  *     whole build family re-fits at exponents ≤ 0.12 where flat had
  *     been 0.88 — the candidate join, its two shuffled aggregates and
  *     the join-back were ~95 % of the assignment's cost.
  *
  *  2. [[rescoreArgmax]] / [[rescoreArgmin]] — the DataFrame-sided
  *     max-then-rescore form, kept for candidate sets too large to
  *     collect. WHY NOT `max(struct(...))` (the round-12 find,
  *     BENCH_k_build.md): a STRUCT aggregation buffer forces
  *     **SortAggregate**, which sorts the full n·k candidate stream with
  *     payloads aboard (>80 GB spill and ENOSPC at the 100× study point);
  *     `TypedImperativeAggregate` falls back to the same sort past 128
  *     in-memory groups. Scoring twice instead keeps every
  *     candidate-volume operator inside whole-stage codegen: `max(double)`
  *     and `min(long)` are plain HashAggregates and the re-score
  *     `score === extreme` filter is a codegen'd predicate. Determinism
  *     holds because the same expression tree over the same rows is
  *     bit-reproducible; the NaN arm reproduces struct-max ordering.
  *
  * HARD REQUIREMENT of the rescoring form: the score expression must be
  * DETERMINISTIC and evaluate to the SAME bits in the aggregate branch
  * and the filter branch — at least one candidate row must satisfy
  * `score === extreme`, or the key group silently VANISHES from the
  * output (callers inner-join the result back, so the row would drop
  * without an error; only the oracle gate would notice). A
  * non-deterministic score, a cast drift between branches, or an AQE
  * replan that changes the expression tree all break this. ArgMaxSpec
  * pins the tripwire: argmax output cardinality == distinct key count.
  * The expression forms are immune by construction (one evaluation).
  */
private[graft] object ArgMax {

  // ------------------------------------------------------ model collection

  /** Collect a model-sized candidate frame into a [[NearestModel]] for the
    * COSINE metric (aux = `sqrt(dot(c,c))`, the same sequential loop as
    * the codegen'd norm). `keyCol` groups candidates for keyed argmax
    * (hier child stage, PQ subspaces); absent = one global group.
    * Control-plane sized by contract — the frames passed here are the
    * ones the engine already collects for k-means updates and quantizer
    * digests.
    */
  def cosModel(small: DataFrame, sCol: String, idCol: String,
               keyCol: Option[String] = None): NearestModel =
    build(collectTriples(small, sCol, idCol, keyCol), cosine = true)

  /** [[cosModel]] for the L2 metric (aux = `dot(c,c)`). */
  def l2Model(small: DataFrame, sCol: String, idCol: String,
              keyCol: Option[String] = None): NearestModel =
    build(collectTriples(small, sCol, idCol, keyCol), cosine = false)

  /** Build a model from driver-resident candidates (k-means loop state). */
  def cosModelOf(cands: Seq[(Long, Array[Double])]): NearestModel =
    build(cands.map { case (id, v) => (0L, id, v) }, cosine = true)

  /** Keyed driver-resident cosine model: (key, id, vector) triples. */
  def cosKeyedModelOf(cands: Seq[(Long, Long, Array[Double])]): NearestModel =
    build(cands, cosine = true)

  /** Keyed driver-resident L2 model: (key, id, vector) triples. */
  def l2ModelOf(cands: Seq[(Long, Long, Array[Double])]): NearestModel =
    build(cands, cosine = false)

  private def collectTriples(small: DataFrame, sCol: String, idCol: String,
                             keyCol: Option[String]): Seq[(Long, Long, Array[Double])] =
    small.select(
        keyCol.map(k => col(k).cast("long")).getOrElse(lit(0L)).as("_k"),
        col(idCol).cast("long").as("_i"),
        col(sCol).cast("array<double>").as("_v"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def build(cands: Seq[(Long, Long, Array[Double])],
                    cosine: Boolean): NearestModel = {
    if (cands.isEmpty)
      return NearestModel(Array.empty, Array(0), Array.empty, Array.empty,
        Array.empty, 0)
    val sorted = cands.sortBy(t => (t._1, t._2))
    val dim = sorted.head._3.length
    require(sorted.forall(_._3.length == dim),
      "argmax model vectors must share one dimension")
    val keys = sorted.map(_._1).distinct.toArray
    val starts = new Array[Int](keys.length + 1)
    var ki = 0
    sorted.zipWithIndex.foreach { case ((k, _, _), i) =>
      while (ki < keys.length && keys(ki) != k) { ki += 1; starts(ki) = i }
    }
    starts(keys.length) = sorted.length
    val vecs = new Array[Double](sorted.length * dim)
    val aux = new Array[Double](sorted.length)
    sorted.zipWithIndex.foreach { case ((_, _, v), i) =>
      System.arraycopy(v, 0, vecs, i * dim, dim)
      val vv = dot(v, v)
      aux(i) = if (cosine) math.sqrt(vv) else vv
    }
    NearestModel(keys, starts, sorted.map(_._2).toArray, vecs, aux, dim)
  }

  // ----------------------------------------------------- expression forms

  /** Per-row argmax-cosine candidate id (see object doc, form 1). An
    * EMPTY model yields a null literal — the caller's rows keep a null
    * cell exactly where the join forms produced an empty frame (only
    * reachable from an empty corpus, where the row side is empty too).
    */
  def argmaxCosine(model: NearestModel, v: Column,
                   key: Column = lit(0L)): Column =
    if (model.isEmpty) lit(null).cast("long")
    else GraftInterop.column(NearestId(
      GraftInterop.expression(key.cast("long")),
      GraftInterop.expression(v), model, cosine = true))

  /** Per-row argmin-L2 candidate id (ties smallest id, NaN greatest). */
  def argminL2(model: NearestModel, v: Column,
               key: Column = lit(0L)): Column =
    if (model.isEmpty) lit(null).cast("long")
    else GraftInterop.column(NearestId(
      GraftInterop.expression(key.cast("long")),
      GraftInterop.expression(v), model, cosine = false))

  /** All `m` PQ code assignments of a vector, fused ([[PqEncodeCodes]]).
    * `model` must be an [[l2Model]] keyed by the subspace index `j`.
    */
  def pqCodes(model: NearestModel, v: Column): Column = {
    val m = model.distinctKeys.length
    GraftInterop.column(PqEncodeCodes(GraftInterop.expression(v), model, m,
      model.dim))
  }

  /** Driver-side replica of the executor argmax for model×model routing
    * (the hier build's centroid→coarse map): same IEEE operation order as
    * the codegen'd loop, so the routing is bit-identical whether computed
    * on the driver or in a plan. Candidates must be sorted by id.
    */
  def argmaxCosineDriver(cands: Seq[(Long, Array[Double])],
                         v: Array[Double]): Long = {
    var bestId = 0L; var bestScore = 0.0; var first = true
    val vn = math.sqrt(dot(v, v))
    cands.foreach { case (id, c) =>
      val score = dot(v, c) / (vn * math.sqrt(dot(c, c)))
      val better = score > bestScore ||
        (java.lang.Double.isNaN(score) && !java.lang.Double.isNaN(bestScore))
      if (first || better) { first = false; bestScore = score; bestId = id }
    }
    require(!first, "argmaxCosineDriver: empty candidate set")
    bestId
  }

  // ------------------------------------------------------ rescoring forms

  /** For each `left` row (keyed `key`, vector `vCol`): the `idCol2` of
    * the broadcast `small` row (vector `sCol`) with the greatest cosine,
    * ties to the smallest id, as column `out`. `candKey` restricts the
    * candidate join to an equi-key (the hier child stage) instead of the
    * full cross. Rows whose key vanishes (impossible while the
    * determinism requirement in the object doc holds) simply don't
    * appear — callers re-attach payloads by an n-row join on `key`.
    */
  def rescoreArgmax(left: DataFrame, key: String, vCol: String,
                    small: DataFrame, sCol: String, idCol2: String,
                    out: String,
                    candKey: Option[String] = None): DataFrame = {
    import graft.functions.VectorFunctions._
    val cos: Column = cosineFast(col(vCol), col(sCol))
    def cand(df: DataFrame): DataFrame = candKey match {
      case Some(k) => df.join(broadcast(small), k)
      case None    => df.join(broadcast(small))
    }
    val mc = cand(left).groupBy(col(key)).agg(max(cos).as("_mc"))
    cand(left.join(mc, key))
      .filter(cos === col("_mc") || (isnan(cos) && isnan(col("_mc"))))
      .groupBy(col(key)).agg(min(col(idCol2)).as(out))
  }

  /** Generic min-then-rescore ARGMIN: for each group (`keys`) over the
    * candidate join `left ⋈ broadcast(small)` (equi-keyed on `candKeys`,
    * cross when empty), the smallest `idCol2` among candidates whose
    * `score` expression equals the group minimum — the same two
    * HashAggregates + codegen filter shape as [[rescoreArgmax]], for
    * score-minimizing selections. Ties resolve to the smallest id; the
    * NaN arm preserves struct-min's ordering (NaN greatest — an all-NaN
    * group still selects its smallest id). `score` must satisfy the
    * object doc's determinism requirement (it is evaluated twice).
    */
  def rescoreArgmin(left: DataFrame, keys: Seq[String], small: DataFrame,
                    candKeys: Seq[String], score: Column, idCol2: String,
                    out: String): DataFrame = {
    def cand(df: DataFrame): DataFrame =
      if (candKeys.isEmpty) df.join(broadcast(small))
      else df.join(broadcast(small), candKeys)
    val ms = cand(left).groupBy(keys.map(col): _*).agg(min(score).as("_ms"))
    cand(left.join(ms, keys))
      .filter(score === col("_ms") || (isnan(score) && isnan(col("_ms"))))
      .groupBy(keys.map(col): _*).agg(min(col(idCol2)).as(out))
  }
}
