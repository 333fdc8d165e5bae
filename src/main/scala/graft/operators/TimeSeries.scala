package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators over the event log: resampling an
  * irregular per-key series onto a fixed grid with linear interpolation —
  * the companion of the LOCF backfill (q90) for feature pipelines that need
  * evenly-spaced inputs. (Reference context: the event log is exactly the
  * shape `HQL/repldump.hql` ships between warehouses; these are its
  * consumer-side transforms.)
  */
object TimeSeries {

  /** Per-key gap-fill onto a fixed `stepUs` grid with linear interpolation.
    *
    * `obs` carries (key, us, value, obs_id) irregular observations; the
    * output has one row per key per grid instant (whole multiples of
    * `stepUs` inside the key's observed span, INCLUSIVE when an endpoint
    * lands exactly on the grid), with the value linearly interpolated
    * between the surrounding observations. A grid instant that coincides
    * with an observation returns that observation's value (the latest by
    * `obs_id` if several share the instant). Null-valued or null-timestamp
    * observations leave the operator entirely (they carry no interpolation
    * signal, and would desynchronize the carried value from the carried
    * timestamp).
    *
    * 100 TB shape: grid rows are generated from a per-key min/max aggregate
    * (one map-side-combinable shuffle, output = keys), then unioned with
    * the observations and resolved by two running windows per key — forward
    * for the previous observation, backward for the next. Both windows
    * partition on the key, so Catalyst plans ONE hash exchange; the second
    * window adds only a re-sort within partitions. No join of grid against
    * observations (the naive as-of-join-per-grid-point doubles the shuffle
    * volume), no per-key collect, per-key state bounded by the span/step
    * ratio. Skewed keys (one device's years-long series) bound the sort,
    * not memory — windows stream within a partition.
    */
  def gapFillInterpolate(obsRaw: DataFrame, stepUs: Long): DataFrame = {
    // Null-valued observations would desynchronize prev_v from prev_us
    // (the value window skips them, the timestamp window would not) —
    // they carry no interpolation signal, so they leave the operator
    // entirely (including the grid-range aggregate).
    val obs = obsRaw.filter(col("value").isNotNull && col("us").isNotNull)
    val step = lit(stepUs)
    // Exact integral grid endpoints via pmod (Column./ is fractional; raw
    // DIV truncates toward zero, which drops in-span points on negative
    // spans): floor-multiple fm(x) = x - pmod(x, step) and ceil-multiple
    // fm(x + step - 1) are correct for any sign of x.
    val rng = obs.groupBy(col("key"))
      .agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      .select(col("key"),
        expr(s"mn + $stepUs - 1 - pmod(mn + $stepUs - 1, $stepUs)").as("lo"),
        expr(s"mx - pmod(mx, $stepUs)").as("hi"))
    val grid = rng.filter(col("hi") >= col("lo"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), step)).as("us"))
    val unioned = obs
      .select(col("key"), col("us"), col("value"), lit(0).as("is_grid"),
        col("obs_id"))
      .unionAll(grid.select(col("key"), col("us"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid"),
        lit(null).cast("long").as("obs_id")))
    val fw = Window.partitionBy(col("key"))
      .orderBy(col("us"), col("is_grid"), col("obs_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Backward pass: observations must precede grid rows at EQUAL us here
    // too (is_grid ASC within the DESC scan) — otherwise a grid instant
    // coinciding with a key's MAXIMUM observation sees no successor and
    // emits null instead of the observation's value.
    val bw = Window.partitionBy(col("key"))
      .orderBy(col("us").desc, col("is_grid").asc, col("obs_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsUs = when(col("is_grid") === 0, col("us"))
    unioned
      .withColumn("prev_v", last(col("value"), ignoreNulls = true).over(fw))
      .withColumn("prev_us", last(obsUs, ignoreNulls = true).over(fw))
      .withColumn("next_v", last(col("value"), ignoreNulls = true).over(bw))
      .withColumn("next_us", last(obsUs, ignoreNulls = true).over(bw))
      .filter(col("is_grid") === 1)
      .select(col("key"), col("us"),
        when(col("next_us") === col("prev_us"), col("prev_v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
            ((col("us") - col("prev_us")) * lit(1.0) /
             (col("next_us") - col("prev_us")))).as("v_raw"))
  }

  /** Rolling z-score anomaly detection over a keyed count series.
    *
    * `series` carries one row per (key, hr) with an integral `cnt` (hr =
    * hours since epoch). Each point is scored against the TRAILING 24-hour
    * window `[hr-24, hr-1]` — a RANGE frame on the integer hour, so gaps in
    * the series shrink the sample instead of silently stretching the
    * lookback (a ROWS frame over a sparse series compares against last
    * week, not last day). Points with fewer than `minPrev` prior
    * observations or zero variance score null; `is_anomaly` flags
    * |z| > `threshold`.
    *
    * Determinism: mean/variance come from the closed form over exact
    * integer window sums (n, Σc, Σc²) — counts are integers, so the sums
    * are exact in any engine and the double arithmetic is the identical
    * IEEE expression tree on both sides (no Welford state whose update
    * order depends on row order). The z is rounded once and the flag is
    * derived from the ROUNDED value, so the anomaly boundary cannot flip
    * on a last-ulp difference.
    *
    * 100 TB shape: one map-side-combinable aggregate to the hourly grain
    * (output = keys × hours, tiny vs the event log), then one window on a
    * single key-hash exchange. Monitoring fleets key by (metric, host) —
    * millions of keys, each a short series: the partition count, not the
    * per-key history, carries the scale. No self-join of the series
    * against its own lookback (the naive formulation shuffles 24× the
    * grid), no global window anywhere.
    */
  def rollingZScore(series: DataFrame, lookbackHours: Int = 24,
                    minPrev: Int = 12, threshold: Double = 2.0): DataFrame = {
    require(minPrev >= 2, "minPrev must be >= 2 (sample variance needs n > 1)")
    val w = Window.partitionBy(col("key")).orderBy(col("hr"))
      .rangeBetween(-lookbackHours, -1)
    // divisions live INSIDE the n_prev guard (CASE branches evaluate
    // lazily), so an empty or single-point lookback cannot trip ANSI
    // divide-by-zero
    val varPrev = (col("s2") - col("s") * lit(1.0) * col("s") / col("n_prev")) /
      (col("n_prev") - 1)
    series
      .withColumn("n_prev", count(col("cnt")).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("z",
        when(col("n_prev") >= minPrev,
          when(varPrev > 0,
            round((col("cnt") - col("s") * lit(1.0) / col("n_prev")) /
              sqrt(varPrev), 6))))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .select(col("key"), col("hr"), col("cnt"), col("n_prev"),
        col("z"), col("is_anomaly"))
  }

  /** Two-sided CUSUM drift detection over a keyed count series — the
    * change-POINT companion of [[rollingZScore]]'s change-SPIKE detector
    * (a slow mean shift never trips a z-score against a window that
    * absorbs the shift; CUSUM accumulates it).
    *
    * Standard tabular CUSUM: `S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − κ))`,
    * `S⁻_t = max(0, S⁻_{t-1} + (μ − κ − x_t))`, alarm when either exceeds
    * `h`. The recurrence LOOKS stateful, but has the exact prefix closed
    * form `S_t = P_t − min(0, min_{j≤t} P_j)` for `P` the running sum of
    * the increments — so both sides compute as ONE running sum + ONE
    * running min per direction on the same key window, no recursion, no
    * per-key iteration. With integral counts and integral `mu`/`kappa`,
    * every intermediate is an exact BIGINT — bit-identical on any engine
    * and any partitioning.
    *
    * 100 TB shape: all four running windows partition on the key and
    * share one key-hash exchange (same partitioning + ordering); cost
    * tracks the series scan exactly like [[rollingZScore]]. A streaming
    * deployment serves it over [[graft.streaming.AnomalyMonitor]]'s
    * maintained count view unchanged.
    */
  def cusum(series: DataFrame, mu: Long, kappa: Long, h: Long): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("p_hi", sum(col("cnt") - mu - kappa).over(w))
      .withColumn("p_lo", sum(lit(mu - kappa) - col("cnt")).over(w))
      .withColumn("s_hi", col("p_hi") - least(lit(0L), min(col("p_hi")).over(w)))
      .withColumn("s_lo", col("p_lo") - least(lit(0L), min(col("p_lo")).over(w)))
      .withColumn("alarm", col("s_hi") > h || col("s_lo") > h)
      .select(col("key"), col("hr"), col("cnt"),
        col("s_hi"), col("s_lo"), col("alarm"))
  }

  /** Group-wise OLS trend fit over a keyed integer count series: per key,
    * the least-squares slope/intercept of cnt vs hr plus r², from the
    * closed form over exact integer sums (n, Σx, Σy, Σxy, Σx², Σy²) — one
    * map-side-combinable aggregate per key, output = keys. The
    * trend-per-metric op of a monitoring stack ("is error volume growing
    * and how fast"), complementing [[rollingZScore]] (point anomalies) and
    * [[cusum]] (level shifts) with the long-horizon drift RATE.
    *
    * Determinism: counts and hours are integers, so every sum is an exact
    * BIGINT at any partitioning (no double-summation order anywhere); the
    * slope/r² doubles come from the identical IEEE expression tree on both
    * engines. Degenerate keys (one observation, or a single distinct hour
    * ⇒ zero x-variance) yield null slope; flat series (zero y-variance)
    * yield null r².
    */
  def trendOls(series: DataFrame): DataFrame = {
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxy = col("sxy"); val sxx = col("sxx"); val syy = col("syy")
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num * lit(1.0) / dx
    series
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("hr")).as("sx"),
        sum(col("cnt")).as("sy"),
        sum(col("hr") * col("cnt")).as("sxy"),
        sum(col("hr") * col("hr")).as("sxx"),
        sum(col("cnt") * col("cnt")).as("syy"))
      .select(col("key"), n.as("n_points"),
        when(dx > 0, round(slope, 6)).as("slope"),
        when(dx > 0, round((sy - slope * sx) / n, 6)).as("intercept"),
        when(dx > 0, when(dy > 0,
          round(num * lit(1.0) * num / (dx * lit(1.0) * dy), 6))).as("r2"))
  }

  /** Seasonal-profile anomaly detection over a keyed hourly count series:
    * each (key, hr) observation is scored against the key's OWN
    * hour-of-day profile (all observations sharing `hr % season`), so a
    * nightly batch spike is judged against other nights, not against the
    * daytime mean — the seasonality-aware complement of
    * [[rollingZScore]] (trailing window, blind to periodic structure) and
    * [[cusum]] (level shifts). The profile includes the scored point
    * itself (the standard "profile over all history" formulation, and the
    * only self-consistent one for a batch pass).
    *
    * Exactness: with integral counts NOTHING here rounds — the profile
    * mean reports as floor-micro units (`s·10⁶ div n`, positive operands
    * so truncating and floor division agree across engines), the residual
    * reports as `cnt·10⁶ − seasonal_micro`, and the anomaly flag is the
    * pure-integer inequality `(cnt·n − s)² > z²·(n·s2 − s²)` — i.e.
    * `(cnt−μ)² > z²σ²_pop` scaled by n², no doubles anywhere, so the flag
    * cannot flip on engine ulps even AT the threshold boundary. Keys
    * need `n ≥ minN` observations of an hour-of-day slot to flag.
    *
    * 100 TB shape: one (key, hod) aggregate whose output is |keys|·season
    * rows — broadcast-sized for metric-monitoring cardinalities — joined
    * back as a broadcast; the series never re-shuffles. (At extreme
    * per-slot volumes `s·10⁶` approaches BIGINT range around Σcnt ~ 9·10¹²
    * per slot; promote the two sums to decimal(38,0) before that.)
    */
  def seasonalAnomaly(seriesRaw: DataFrame, season: Int = 24, minN: Long = 4,
                      z: Long = 3): DataFrame = {
    // the series feeds both the profile aggregate and the probe side of
    // the join — cached, its (usually expensive) upstream aggregation
    // runs once instead of once per branch
    val series = seriesRaw.cache()
    val hod = pmod(col("hr"), lit(season.toLong))
    val prof = series.groupBy(col("key"), hod.as("hod"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("s2"))
    val residN = col("cnt") * col("n") - col("s")
    val varN2 = col("n") * col("s2") - col("s") * col("s")
    series.withColumn("hod", hod)
      .join(broadcast(prof), Seq("key", "hod"))
      .select(col("key"), col("hr"), col("hod"), col("cnt"),
        col("n").as("n_slot"),
        expr("s * 1000000 DIV n").as("seasonal_micro"),
        (col("cnt") * lit(1000000L) - expr("s * 1000000 DIV n")).as("resid_micro"),
        (col("n") >= minN &&
          residN * residN > lit(z * z) * varN2).as("is_anomaly"))
  }

  val queries: Seq[Query] = Seq(
    // Hourly regularization of each sampled user's event-value series:
    // grid instants inside the user's span (inclusive at grid-aligned
    // endpoints), linearly interpolated between the surrounding events.
    // The identical window construction on
    // both engines makes the interpolation arithmetic (exact int64 micros
    // promoted to double the same way) match to the rounded digit.
    Query(
      "q120_gap_fill",
      Some("""
        WITH obs AS (
          SELECT user_id, epoch_us(ts) AS us, value, event_id
          FROM events
          WHERE user_id % 10 = 0 AND value IS NOT NULL AND ts IS NOT NULL),
        rng AS (SELECT user_id,
                  min(us) + 3599999999
                    - ((((min(us) + 3599999999) % 3600000000) + 3600000000)
                       % 3600000000) AS lo,
                  max(us) - (((max(us) % 3600000000) + 3600000000)
                       % 3600000000) AS hi
                FROM obs GROUP BY 1),
        grid AS (SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS us
                 FROM rng WHERE hi >= lo),
        u AS (
          SELECT user_id, us, value, 0 AS is_grid, event_id FROM obs
          UNION ALL
          SELECT user_id, us, NULL, 1, NULL FROM grid),
        f AS (
          SELECT user_id, us, is_grid,
            last_value(value IGNORE NULLS) OVER fw AS prev_v,
            last_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS)
              OVER fw AS prev_us,
            last_value(value IGNORE NULLS) OVER bw AS next_v,
            last_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS)
              OVER bw AS next_us
          FROM u
          WINDOW fw AS (PARTITION BY user_id ORDER BY us, is_grid, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 bw AS (PARTITION BY user_id
                        ORDER BY us DESC, is_grid ASC, event_id DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, us,
               round(CASE WHEN next_us = prev_us THEN prev_v
                          ELSE prev_v + (next_v - prev_v) *
                               ((us - prev_us) * 1.0 / (next_us - prev_us))
                     END, 6) AS v_interp
        FROM f WHERE is_grid = 1
        ORDER BY user_id, us"""))((spark, dir) => {
      val obs = Tables(spark, dir).events
        .filter(col("user_id") % 10 === 0)
        .select(col("user_id").as("key"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("value"), col("event_id").as("obs_id"))
      gapFillInterpolate(obs, stepUs = 3600000000L)
        .select(col("key").as("user_id"), col("us"),
          round(col("v_raw"), 6).as("v_interp"))
        .orderBy(col("user_id"), col("us"))
    }),

    // Operational anomaly detection: each event type's hourly volume
    // scored against its own trailing 24 hours. The closed-form
    // integer-sum variance makes the z reproducible bit-for-bit in
    // DuckDB; the flag derives from the rounded z so the |z| > 2
    // boundary cannot flip on engine ulps.
    Query(
      "q127_anomaly_zscore",
      Some("""
        WITH hourly AS (
          SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        scored AS (
          SELECT key, hr, cnt,
            COUNT(cnt) OVER w AS n_prev,
            SUM(cnt) OVER w AS s,
            SUM(cnt * cnt) OVER w AS s2
          FROM hourly
          WINDOW w AS (PARTITION BY key ORDER BY hr
                       RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        z AS (
          SELECT key, hr, cnt, n_prev,
            CASE WHEN n_prev >= 12
                  AND (s2 - s * 1.0 * s / n_prev) / (n_prev - 1) > 0
                 THEN round((cnt - s * 1.0 / n_prev) /
                        sqrt((s2 - s * 1.0 * s / n_prev) / (n_prev - 1)), 6)
            END AS z
          FROM scored)
        SELECT key, hr, cnt, n_prev, z,
               COALESCE(abs(z) > 2.0, FALSE) AS is_anomaly
        FROM z
        ORDER BY key, hr"""))((spark, dir) => {
      val hourly = Tables(spark, dir).events
        .select(col("event_type").as("key"),
          expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").as("hr"))
        .groupBy(col("key"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      rollingZScore(hourly, lookbackHours = 24, minPrev = 12, threshold = 2.0)
        .orderBy(col("key"), col("hr"))
    }),

    // Two-sided CUSUM drift detection per event type (μ=3, κ=1, h=20):
    // exact BIGINT prefix sums/mins, so the alarm sequence hash-matches.
    // The oracle computes the identical prefix closed form.
    Query(
      "q131_cusum",
      Some("""
        WITH hourly AS (
          SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        p1 AS (
          SELECT key, hr, cnt,
            SUM(cnt - 4) OVER w AS p_hi,
            SUM(2 - cnt) OVER w AS p_lo
          FROM hourly
          WINDOW w AS (PARTITION BY key ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p2 AS (
          SELECT key, hr, cnt, p_hi, p_lo,
            least(0, min(p_hi) OVER w2) AS f_hi,
            least(0, min(p_lo) OVER w2) AS f_lo
          FROM p1
          WINDOW w2 AS (PARTITION BY key ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT key, hr, cnt,
               CAST(p_hi - f_hi AS BIGINT) AS s_hi,
               CAST(p_lo - f_lo AS BIGINT) AS s_lo,
               (p_hi - f_hi > 20 OR p_lo - f_lo > 20) AS alarm
        FROM p2
        ORDER BY key, hr"""))((spark, dir) => {
      val hourly = Tables(spark, dir).events
        .select(col("event_type").as("key"),
          expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").as("hr"))
        .groupBy(col("key"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      cusum(hourly, mu = 3L, kappa = 1L, h = 20L)
        .orderBy(col("key"), col("hr"))
    }),

    // Per-event-type load trend: OLS slope/intercept/r² of hourly volume
    // vs time. Sums are exact BIGINTs, the closed-form doubles share one
    // expression tree — the whole fit hash-matches.
    Query(
      "q134_trend_ols",
      Some("""
        WITH hourly AS (
          SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT key, COUNT(*) AS n, SUM(hr) AS sx, SUM(cnt) AS sy,
                 SUM(hr * cnt) AS sxy, SUM(hr * hr) AS sxx,
                 SUM(cnt * cnt) AS syy
          FROM hourly GROUP BY 1)
        SELECT key, CAST(n AS BIGINT) AS n_points,
          CASE WHEN n * sxx - sx * sx > 0
               THEN round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
          END AS slope,
          CASE WHEN n * sxx - sx * sx > 0
               THEN round((sy - ((n * sxy - sx * sy) * 1.0
                                 / (n * sxx - sx * sx)) * sx) / n, 6)
          END AS intercept,
          CASE WHEN n * sxx - sx * sx > 0 THEN
            CASE WHEN n * syy - sy * sy > 0
                 THEN round((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
                        / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
            END
          END AS r2
        FROM s ORDER BY key"""))((spark, dir) => {
      val hourly = Tables(spark, dir).events
        .select(col("event_type").as("key"),
          expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").as("hr"))
        .groupBy(col("key"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      trendOls(hourly).orderBy(col("key"))
    }),

    // Seasonality-aware anomaly detection: each event type's hourly volume
    // scored against its own hour-of-day slot (z=3, slots need >= 4
    // observations). The flag is a pure-integer inequality — nothing
    // rounds, so the boundary cannot flip on engine ulps.
    Query(
      "q139_seasonal_anomaly",
      Some("""
        WITH hourly AS (
          SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        prof AS (
          SELECT key, hr % 24 AS hod, COUNT(*) AS n, SUM(cnt) AS s,
                 SUM(cnt * cnt) AS s2
          FROM hourly GROUP BY 1, 2)
        SELECT key, hr, hod, cnt,
               CAST(n AS BIGINT) AS n_slot,
               CAST(s * 1000000 // n AS BIGINT) AS seasonal_micro,
               CAST(cnt * 1000000 - s * 1000000 // n AS BIGINT) AS resid_micro,
               (n >= 4 AND (cnt * n - s) * (cnt * n - s)
                           > 9 * (n * s2 - s * s)) AS is_anomaly
        FROM hourly JOIN prof USING (key)
        WHERE hourly.hr % 24 = prof.hod
        ORDER BY key, hr"""))((spark, dir) => {
      val hourly = Tables(spark, dir).events
        .select(col("event_type").as("key"),
          expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").as("hr"))
        .groupBy(col("key"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      seasonalAnomaly(hourly, season = 24, minN = 4L, z = 3L)
        .orderBy(col("key"), col("hr"))
    })
  )
}
