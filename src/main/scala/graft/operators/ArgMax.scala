package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sort-free nearest-centroid argmax — the max-then-rescore form every
  * cell assignment in the engine uses.
  *
  * WHY THIS SHAPE (the round-12 find, BENCH_k_build.md): the idiomatic
  * one-pass argmax — `max(struct(cos, -cid, …))` — has a STRUCT
  * aggregation buffer, which HashAggregateExec cannot hold, so Spark
  * plans **SortAggregate** and SORTS the aggregate's full n·k candidate
  * input by group key before reducing it (~5 µs/candidate at the 30×
  * study point, each row dragging any payload fields through the sort;
  * at the 100× point the sort spilled >80 GB and died ENOSPC — while the
  * committed study had been reporting 0.71 s, because its `count()`
  * consumption let column pruning delete the argmax entirely). A
  * `TypedImperativeAggregate` (ObjectHashAggregate) is no escape: it
  * falls back to sort-based aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` = 128
  * in-memory groups — measured, same ENOSPC.
  *
  * Scoring twice keeps EVERY candidate-volume operator inside whole-stage
  * codegen: `max(double)` and `min(long)` are plain HashAggregates, the
  * re-score `cos === mc` filter is a codegen'd predicate over the
  * regenerated broadcast join, and the only sorts anywhere are n-row
  * SMJs (the fixed measured point: flat build at 200 k vectors × 1600
  * cells = 20 s where the struct-max form died on disk). The duplicated
  * cosine scan is the cheap part (64 FMAs/candidate); determinism holds
  * because the same expression tree over the same rows is
  * bit-reproducible, and the NaN arm reproduces the struct-max ordering
  * exactly (NaN greatest). Ties resolve to the SMALLEST id — identical
  * to `max(struct(cos, -cid))` — under any partitioning.
  */
private[graft] object ArgMax {

  /** For each `left` row (keyed `key`, vector `vCol`): the `idCol2` of
    * the broadcast `small` row (vector `sCol`) with the greatest cosine,
    * ties to the smallest id, as column `out`. `candKey` restricts the
    * candidate join to an equi-key (the hier child stage) instead of the
    * full cross. Rows whose key vanishes (impossible on non-empty
    * `small`) simply don't appear — callers re-attach payloads by an
    * n-row join on `key`.
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
    * score-minimizing selections (PQ code assignment's L2). Ties resolve
    * to the smallest id; the NaN arm preserves struct-min's ordering
    * (NaN greatest — an all-NaN group still selects its smallest id).
    * `score` must reference only columns of the candidate join and be
    * deterministic (it is evaluated twice; bit-reproducible by
    * expression-tree identity).
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
