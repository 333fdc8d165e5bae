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

  private def seriesDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("key", "hr", "cnt")
  }

  test("rollingZScore: hand-computed z over a dense window") {
    // 13 prior hours of cnt=10, then a spike of 20: mean=10, var=0 -> the
    // flat history scores null; make history {9,11} alternating so var>0.
    val hist = (0L until 12L).map(h => ("m", h, if (h % 2 == 0) 9L else 11L))
    val got = TimeSeries.rollingZScore(seriesDf(hist :+ (("m", 12L, 20L))),
        lookbackHours = 24, minPrev = 12, threshold = 2.0)
      .filter(col("hr") === 12).collect().head
    // n=12, s=120, s2=1212; mean=10; var=(1212-1200)/11=12/11
    val z = (20.0 - 10.0) / math.sqrt(12.0 / 11.0)
    assert(got.getAs[Long]("n_prev") == 12L)
    assert(math.abs(got.getAs[Double]("z") - math.rint(z * 1e6) / 1e6) < 1e-9)
    assert(got.getAs[Boolean]("is_anomaly"))
  }

  test("rollingZScore: RANGE frame sees true hours, not row offsets") {
    // A 30-hour gap: the point after the gap has NO prior rows in its
    // 24-hour range even though 12 rows precede it in row order.
    val hist = (0L until 12L).map(h => ("m", h, 5L))
    val got = TimeSeries.rollingZScore(seriesDf(hist :+ (("m", 42L, 50L))),
        minPrev = 2)
      .filter(col("hr") === 42).collect().head
    assert(got.getAs[Long]("n_prev") == 0L)
    assert(got.isNullAt(got.fieldIndex("z")))
    assert(!got.getAs[Boolean]("is_anomaly"))
  }

  test("rollingZScore: zero variance and short history score null, never error") {
    val flat = (0L until 20L).map(h => ("m", h, 7L))
    val rows = TimeSeries.rollingZScore(seriesDf(flat), minPrev = 2).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("z"))))
    // single-point lookback (n_prev=1) must not trip ANSI divide-by-zero
    val two = TimeSeries.rollingZScore(
      seriesDf(Seq(("m", 0L, 1L), ("m", 1L, 9L))), minPrev = 2).collect()
    assert(two.length == 2)
  }

  test("rollingZScore is partitioning-independent") {
    val series = seriesDf((0L until 40L).map(h => ("a", h, (h * 7 % 13))) ++
      (0L until 40L).map(h => ("b", h, (h * 11 % 17))))
    val a = TimeSeries.rollingZScore(series).orderBy("key", "hr").collect().toSeq
    val b = TimeSeries.rollingZScore(series.repartition(7))
      .orderBy("key", "hr").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("cusum: closed form equals the stateful recurrence, alarms on drift") {
    // history at the target mean, then a sustained +3 shift: the z-score's
    // trailing window absorbs a slow shift, CUSUM accumulates it.
    val counts = Seq.fill(10)(3L) ++ Seq.fill(10)(6L)
    val series = seriesDf(counts.zipWithIndex.map { case (c, h) => ("m", h.toLong, c) })
    val got = TimeSeries.cusum(series, mu = 3L, kappa = 1L, h = 8L)
      .orderBy("hr").collect()
      .map(r => (r.getAs[Long]("s_hi"), r.getAs[Long]("s_lo"),
        r.getAs[Boolean]("alarm")))
    // reference: the literal recurrence
    var (sh, sl) = (0L, 0L)
    val want = counts.map { c =>
      sh = math.max(0L, sh + (c - 3 - 1)); sl = math.max(0L, sl + (3 - 1 - c))
      (sh, sl, sh > 8 || sl > 8)
    }
    assert(got.toSeq == want)
    assert(got.last._3, "sustained +3 drift must alarm")
    assert(!got(9)._3, "no alarm while on target")
  }

  test("cusum: downward drift trips the low side with exact integers") {
    val counts = Seq.fill(6)(10L) ++ Seq.fill(8)(2L)
    val series = seriesDf(counts.zipWithIndex.map { case (c, h) => ("m", h.toLong, c) })
    val rows = TimeSeries.cusum(series, mu = 10L, kappa = 2L, h = 20L)
      .orderBy("hr").collect()
    assert(rows.last.getAs[Boolean]("alarm"))
    assert(rows.last.getAs[Long]("s_lo") == 8 * (10 - 2 - 2))
    assert(rows.forall(_.getAs[Long]("s_hi") == 0L))
  }

  test("cusum is partitioning-independent") {
    val series = seriesDf((0L until 50L).map(h => ("a", h, h * 13 % 7)) ++
      (0L until 50L).map(h => ("b", h, h * 17 % 11)))
    val a = TimeSeries.cusum(series, 3L, 1L, 10L).orderBy("key", "hr").collect().toSeq
    val b = TimeSeries.cusum(series.repartition(7), 3L, 1L, 10L)
      .orderBy("key", "hr").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("trendOls: exact line recovered; degenerate keys go null, flat keys r2-null") {
    val series = seriesDf(
      (0L until 10L).map(h => ("line", h, 2 * h + 1)) ++   // y = 2x + 1
      Seq(("single", 5L, 7L)) ++                            // one point
      (0L until 6L).map(h => ("flat", h, 4L)))              // zero y-variance
    val got = TimeSeries.trendOls(series).collect()
      .map(r => r.getString(0) -> r).toMap
    val line = got("line")
    assert(line.getAs[Double]("slope") == 2.0 &&
      line.getAs[Double]("intercept") == 1.0 &&
      line.getAs[Double]("r2") == 1.0)
    val single = got("single")
    assert(single.isNullAt(single.fieldIndex("slope")) &&
      single.isNullAt(single.fieldIndex("r2")))
    val flat = got("flat")
    assert(flat.getAs[Double]("slope") == 0.0 &&
      flat.isNullAt(flat.fieldIndex("r2")))
  }

  test("trendOls is partitioning-independent") {
    val series = seriesDf((0L until 200L).map(h => ("a", h, h * 13 % 17)) ++
      (0L until 200L).map(h => ("b", h, 50 - h % 9)))
    val a = TimeSeries.trendOls(series).orderBy("key").collect().toSeq
    val b = TimeSeries.trendOls(series.repartition(7)).orderBy("key").collect().toSeq
    assert(a == b && a.nonEmpty)
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

  test("seasonalAnomaly: hand-computed slot stats, spike flagged, peers not") {
    // Slot hod=1 of key a: hours 1/25/49/73 with counts 5/5/5/50.
    // n=4, s=65, s2=2575: seasonal_micro = 65e6 div 4 = 16_250_000;
    // spike residual_n = 50*4-65 = 135, var_n2 = 4*2575-65^2 = 6075 —
    // z=1 flags the spike (135^2 > 6075), not the 5s (45^2 <= 6075).
    val series = seriesDf(Seq(
      ("a", 1L, 5L), ("a", 25L, 5L), ("a", 49L, 5L), ("a", 73L, 50L)))
    val got = TimeSeries.seasonalAnomaly(series, season = 24, minN = 4, z = 1)
      .orderBy("hr").collect()
    assert(got.forall(_.getAs[Long]("seasonal_micro") == 16250000L))
    assert(got.forall(_.getAs[Long]("n_slot") == 4L))
    val byHr = got.map(r =>
      r.getAs[Long]("hr") -> (r.getAs[Long]("resid_micro"),
        r.getAs[Boolean]("is_anomaly"))).toMap
    assert(byHr(73L) == ((50000000L - 16250000L, true)))
    assert(byHr(1L) == ((5000000L - 16250000L, false)))
  }

  test("seasonalAnomaly: slots are independent; constant slots never flag") {
    // hod=2 rows are constant -> residual 0; the hod=1 spike cannot leak.
    val series = seriesDf(Seq(
      ("a", 1L, 5L), ("a", 25L, 5L), ("a", 49L, 5L), ("a", 73L, 500L),
      ("a", 2L, 7L), ("a", 26L, 7L), ("a", 50L, 7L), ("a", 74L, 7L)))
    val got = TimeSeries.seasonalAnomaly(series, season = 24, minN = 4, z = 1)
      .filter(col("hod") === 2).collect()
    assert(got.length == 4)
    assert(got.forall(r => r.getAs[Long]("resid_micro") == 0L &&
      !r.getAs[Boolean]("is_anomaly")))
  }

  test("seasonalAnomaly: the minN guard holds even for huge residuals") {
    // Only 3 observations of the slot: never anomalous at minN=4.
    val series = seriesDf(Seq(
      ("a", 1L, 1L), ("a", 25L, 1L), ("a", 49L, 1000L)))
    val got = TimeSeries.seasonalAnomaly(series, season = 24, minN = 4, z = 1)
      .collect()
    assert(got.length == 3 && got.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("seasonalAnomaly is partitioning-independent") {
    val series = seriesDf((0L until 480L).map(h =>
      ("k" + (h % 3), h, (h * 31) % 23)))
    val a = TimeSeries.seasonalAnomaly(series).orderBy("key", "hr")
      .collect().toSeq
    val b = TimeSeries.seasonalAnomaly(series.repartition(7))
      .orderBy("key", "hr").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
