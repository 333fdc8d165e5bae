package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private def obsDf(rows: Seq[(Long, Long, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("key", "us", "value", "obs_id")
  }

  test("gapFillInterpolate: linear values between surrounding observations") {
    // key 1: obs (1000 -> 10.0), (5000 -> 50.0); step 2000 => grid {2000, 4000}.
    val got = TimeSeries.gapFillInterpolate(
        obsDf(Seq((1L, 1000L, 10.0, 1L), (1L, 5000L, 50.0, 2L))), stepUs = 2000L)
      .orderBy("us").collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("v_raw"))).toSeq
    assert(got == Seq((2000L, 20.0), (4000L, 40.0)))
  }

  test("grid instant on an observation returns that observation (latest obs_id)") {
    // Two observations share the exact grid instant 2000; the later obs_id wins.
    val got = TimeSeries.gapFillInterpolate(
        obsDf(Seq((1L, 1000L, 10.0, 1L), (1L, 2000L, 77.0, 2L),
          (1L, 2000L, 99.0, 3L), (1L, 5000L, 50.0, 4L))), stepUs = 2000L)
      .orderBy("us").collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("v_raw"))).toSeq
    assert(got.head == ((2000L, 99.0)))
  }

  test("a key whose span contains no whole grid step emits no rows") {
    val got = TimeSeries.gapFillInterpolate(
      obsDf(Seq((1L, 100L, 1.0, 1L), (1L, 300L, 3.0, 2L))), stepUs = 100000L)
    assert(got.count() == 0)
  }

  test("grid-aligned span endpoints are included and return the endpoint observation") {
    val got = TimeSeries.gapFillInterpolate(
        obsDf(Seq((1L, 0L, 10.0, 1L), (1L, 4000L, 50.0, 2L))), stepUs = 2000L)
      .orderBy("us").collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("v_raw"))).toSeq
    assert(got == Seq((0L, 10.0), (2000L, 30.0), (4000L, 50.0)))
  }

  test("negative (pre-epoch) spans keep every in-span grid point") {
    // floor/ceil multiples must not truncate toward zero: span [-3000, -100]
    // contains exactly the grid point -2000.
    val got = TimeSeries.gapFillInterpolate(
        obsDf(Seq((1L, -3000L, 0.0, 1L), (1L, -100L, 29.0, 2L))), stepUs = 2000L)
      .orderBy("us").collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("v_raw"))).toSeq
    assert(got == Seq((-2000L, 10.0)))
  }

  test("null-valued observations leave the operator entirely (span included)") {
    import spark.implicits._
    // A trailing null obs at 9000 must not extend the grid past the last
    // REAL observation at 5000, and must not perturb interpolation.
    val rows = Seq((1L, 1000L, Some(10.0), 1L), (1L, 5000L, Some(50.0), 2L),
      (1L, 9000L, None: Option[Double], 3L))
    val got = TimeSeries.gapFillInterpolate(
        rows.toDF("key", "us", "value", "obs_id"), stepUs = 2000L)
      .orderBy("us").collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("v_raw"))).toSeq
    assert(got == Seq((2000L, 20.0), (4000L, 40.0)))
  }

  test("gapFillInterpolate is partitioning-independent") {
    val obs = obsDf(Seq(
      (1L, 1000L, 10.0, 1L), (1L, 5000L, 50.0, 2L), (1L, 9000L, 10.0, 3L),
      (2L, 500L, 0.0, 4L), (2L, 8500L, 16.0, 5L)))
    val a = TimeSeries.gapFillInterpolate(obs, 2000L)
      .orderBy("key", "us").collect().toSeq
    val b = TimeSeries.gapFillInterpolate(obs.repartition(7), 2000L)
      .orderBy("key", "us").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
