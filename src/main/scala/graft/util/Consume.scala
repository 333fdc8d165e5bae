package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StructType, ArrayType}

/** Consumption-faithful evaluation for timing harnesses.
  *
  * Timing `df.count()` measures the plan count() NEEDS, not the plan the
  * operator produces: Catalyst's ColumnPruning deletes every result
  * column nothing references — unused aggregate expressions, whole
  * Window computations, the `max(struct(cos, …))` argmax of a cell
  * assignment — so a benchmark row can silently time an empty-handed
  * distinct-keys pass while reporting itself as the operator's cost
  * (found in round 12: the flat IVF build's ENTIRE cosine scoring was
  * pruned out of BENCH_sf4_build's rows, flattering flat by ~30× at the
  * 100× point; BENCH_k_build.md documents the case).
  *
  * [[checksum]] consumes a frame by hashing EVERY output column into one
  * aggregated long — the timed plan is then the plan a real consumer
  * (a parquet write, a downstream join) pays for, at the cost of one
  * xxhash64 per row, negligible against the work it forces. Map-typed
  * columns (and any type nesting a map) hash via to_json, because
  * hash()/xxhash64 on MapType is disallowed.
  */
object Consume {

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType => containsMap(a.elementType)
    case _ => false
  }

  /** One-row frame `bit_xor(xxhash64(all columns))` over `df` — evaluating
    * it forces every column of every row. Exposed (rather than just
    * [[checksum]]) so callers that need the executed DataFrame afterwards
    * (plan fingerprinting) can hold it.
    *
    * NOT a content-equivalence check: XOR cancels duplicate rows pairwise
    * (any even multiset of identical rows contributes 0), which is fine
    * for the one purpose here — forcing consumption so timing can't be
    * column-pruned — but two frames differing by an even number of
    * duplicate rows would collide. Content comparison is the driver's
    * oracle gate (sorted-rows hash), not this.
    */
  def frame(df: DataFrame): DataFrame = {
    // positional rename first: raw column names may contain dots/spaces
    // that column resolution would misread as nested-field paths
    val d = df.toDF(df.columns.indices.map(i => s"_c$i"): _*)
    val cols: Seq[Column] = d.schema.fields.map { f =>
      if (containsMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }.toSeq
    // bit_xor, not sum: ANSI mode (Spark 4 default) makes a long-sum of
    // hashes overflow; xor is order-independent and cannot overflow
    d.select(xxhash64(cols: _*).as("_h"))
      .agg(expr("bit_xor(_h)").as("checksum"))
  }

  /** Evaluate every output column of `df`; returns the row-order-
    * independent checksum (0 for an empty frame).
    */
  def checksum(df: DataFrame): Long = {
    val r = frame(df).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
