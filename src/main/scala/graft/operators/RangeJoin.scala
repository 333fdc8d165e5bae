package graft.operators

import graft.{Query, Tables}
import graft.util.Exact.{dsum, sqlSum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale.
  *
  * A raw `point BETWEEN start AND end` join condition has no equi-key, so
  * Spark plans a nested-loop join — quadratic and cluster-hostile. The
  * standard fix is BINNING: quantize time into fixed buckets, explode each
  * interval to the buckets it covers, tag each point with its single
  * bucket, equi-join on the bucket and post-filter exact containment. The
  * join becomes hash-partitionable (broadcast when the interval side is
  * small), cost is |points| + |intervals| × avg-buckets-per-interval, and
  * no pair of rows is ever compared outside a shared bucket. Because a
  * point has exactly ONE bucket, a (point, interval) pair can only meet
  * once — no dedup step.
  */
object RangeJoin {

  /** Equi-binned range join: `points` (with a long `ts_us` column) joined
    * to `intervals` (`interval_id`, `start_us`, `end_us`) on containment.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      binUs: Long): DataFrame = {
    val ev = points.withColumn("_bin", col("ts_us") - pmod(col("ts_us"), lit(binUs)))
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        col("start_us") - pmod(col("start_us"), lit(binUs)),
        col("end_us") - pmod(col("end_us"), lit(binUs)),
        lit(binUs))))
    ev.join(iv, Seq("_bin"))
      .filter(col("ts_us").between(col("start_us"), col("end_us")))
      .drop("_bin")
  }

  // ------------------------------------------------------------ query corpus

  private val T0Us = 1704067200000000L // 2024-01-01 00:00:00 UTC, epoch micros
  private val StepUs = 41617000000L // deliberately bin-misaligned interval starts
  private val LenUs = 9257000000L
  private val NIntervals = 48

  val queries: Seq[Query] = Seq(
    Query(
      "q58_range_join_binned",
      Some(s"""
        WITH iv AS (SELECT t AS interval_id,
                      $T0Us + t * $StepUs AS start_us,
                      $T0Us + t * $StepUs + $LenUs AS end_us
                    FROM range($NIntervals) AS u(t)),
        ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events)
        SELECT iv.interval_id, COUNT(*) AS n,
               ${sqlSum("value")} AS total_value
        FROM iv JOIN ev ON ev.ts_us BETWEEN iv.start_us AND iv.end_us
        GROUP BY 1 ORDER BY 1"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val points = t.events.select(
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val intervals = broadcast(spark.range(NIntervals).select(
        col("id").as("interval_id"),
        (lit(T0Us) + col("id") * StepUs).as("start_us"),
        (lit(T0Us) + col("id") * StepUs + LenUs).as("end_us")))
      binnedRangeJoin(points, intervals, binUs = 3600000000L)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("interval_id"))
    })
  )
}
