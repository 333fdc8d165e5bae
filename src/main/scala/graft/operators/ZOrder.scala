package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * Parquet min-max row-group/file statistics prune on ONE sort dimension:
  * sorting by `x` makes `x` predicates skip almost everything, and `y`
  * predicates skip nothing (every file spans the full `y` range).
  * Interleaving the bits of rank-bucketed `x` and `y` into one Morton key
  * and sorting by THAT gives every file a narrow extent in BOTH dimensions
  * (~sqrt of the one-dim extent per dim for 2 dims), so predicates on
  * either column — or both — prune. This is the clustering layout Delta's
  * OPTIMIZE ZORDER and Iceberg's sort orders use for exactly this reason;
  * here it is a pure-Spark column expression plus a write helper.
  *
  * Scale shape (100 TB): the key is a native codegen'd expression (shifts,
  * masks, adds — no UDF) computed in one map pass; the only extra cost
  * over a plain clustered write is the one-row min/max aggregate
  * (broadcast) and the range exchange the write would pay anyway. Bucket
  * normalization uses integer arithmetic on broadcast corpus min/max —
  * deterministic at any partition count, and reproduced bit-for-bit by
  * the DuckDB oracle.
  */
object ZOrder {

  /** Bucket an integral column into `2^bits` equal-width buckets over the
    * CLOSED range [minC, maxC] using pure integer arithmetic:
    * `(x - min) * 2^bits DIV (max - min + 1)` — exact, overflow-safe for
    * values up to ~2^(62-bits), and identical in DuckDB (`//`). Both
    * engines' bare `/` is FLOAT division — integral DIV keeps every bit
    * exact and the downstream shifts on native longs.
    */
  private def bucket(x: Column, minC: Column, maxC: Column, bits: Int): Column =
    call_function("div", (x - minC).cast("long") * (1L << bits),
      (maxC - minC + lit(1L)).cast("long"))

  /** Morton-interleave two bucketed dimensions: bit `b` of each bucket
    * lands at bit `2b` (x) / `2b+1` (y) of the key. A fold of native
    * shift/mask/add expressions — whole-stage-codegen'd.
    */
  def interleave2(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(bx, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(by, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** The Morton key of `(x, y)` given broadcast corpus min/max columns. */
  def zorderKey2(x: Column, y: Column,
                 xMin: Column, xMax: Column, yMin: Column, yMax: Column,
                 bits: Int = 8): Column =
    interleave2(bucket(x, xMin, xMax, bits), bucket(y, yMin, yMax, bits), bits)

  /** DuckDB twin of [[interleave2]] over pre-bucketed expressions. */
  def sqlInterleave2(bx: String, by: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($bx >> $b) & 1) << ${2 * b}) + ((($by >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** Write `df` parquet z-ordered on two integral columns: one min/max
    * aggregate (broadcast onto the scan), the Morton key, a range exchange
    * into `nFiles` key ranges, and a local sort so row groups inside each
    * file are narrow too. The key is dropped before write — the layout IS
    * the artifact. Returns the written file count.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  nFiles: Int, bits: Int = 8): Int = {
    val stats = df.agg(
      min(col(xCol)).cast("long").as("_xmin"), max(col(xCol)).cast("long").as("_xmax"),
      min(col(yCol)).cast("long").as("_ymin"), max(col(yCol)).cast("long").as("_ymax"))
    val keyed = df.crossJoin(broadcast(stats))
      .withColumn("_zkey", zorderKey2(col(xCol), col(yCol),
        col("_xmin"), col("_xmax"), col("_ymin"), col("_ymax"), bits))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
    keyed
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).inputFiles.length
  }

  val queries: Seq[Query] = Seq(
    // Z-cell locality profile of lineitem over (l_partkey, l_suppkey):
    // per coarse Morton cell (top 8 of 16 key bits), the row count and the
    // extent of both dimensions — the min-max narrowness that file-level
    // statistics would prune on after a z-ordered write.
    Query(
      "q112_zorder_cells",
      Some(s"""
        WITH s AS (SELECT MIN(l_partkey) AS xmin, MAX(l_partkey) AS xmax,
                          MIN(l_suppkey) AS ymin, MAX(l_suppkey) AS ymax
                   FROM lineitem),
        b AS (SELECT CAST((l_partkey - xmin) * 256 AS BIGINT)
                       // CAST(xmax - xmin + 1 AS BIGINT) AS bx,
                     CAST((l_suppkey - ymin) * 256 AS BIGINT)
                       // CAST(ymax - ymin + 1 AS BIGINT) AS by,
                     l_partkey, l_suppkey
              FROM lineitem CROSS JOIN s),
        k AS (SELECT ${sqlInterleave2("bx", "by", 8)} AS zkey,
                     l_partkey, l_suppkey
              FROM b)
        SELECT zkey >> 8 AS zcell, COUNT(*) AS n_rows,
               MAX(l_partkey) - MIN(l_partkey) AS x_extent,
               MAX(l_suppkey) - MIN(l_suppkey) AS y_extent
        FROM k GROUP BY zcell ORDER BY zcell"""))((spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val stats = li.agg(
        min(col("l_partkey")).cast("long").as("_xmin"),
        max(col("l_partkey")).cast("long").as("_xmax"),
        min(col("l_suppkey")).cast("long").as("_ymin"),
        max(col("l_suppkey")).cast("long").as("_ymax"))
      li.crossJoin(broadcast(stats))
        .withColumn("zkey", zorderKey2(col("l_partkey"), col("l_suppkey"),
          col("_xmin"), col("_xmax"), col("_ymin"), col("_ymax"), bits = 8))
        .groupBy(shiftright(col("zkey"), 8).as("zcell"))
        .agg(count(lit(1)).as("n_rows"),
          (max(col("l_partkey")) - min(col("l_partkey"))).as("x_extent"),
          (max(col("l_suppkey")) - min(col("l_suppkey"))).as("y_extent"))
        .orderBy(col("zcell"))
    })
  )
}
