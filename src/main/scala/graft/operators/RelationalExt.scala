package graft.operators

import graft.{Query, Tables}
import graft.util.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

/** Extended relational surface: as-of join, pivot, CUBE, exact percentiles,
  * lateral posexplode, window frames (RANGE), first/last/nth window values,
  * boolean/conditional aggregates. Completes the SURVEY.md §2.3 checklist
  * beyond the base corpus in [[Relational]].
  */
object RelationalExt {

  private val dec = DecimalType(18, 4)

  val queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q39
    // As-of join: each event picks the user's most recent order at/before
    // the event time. Oracle uses DuckDB's native ASOF JOIN; the engine's
    // union+window implementation (one shuffle) must produce the identical
    // row set.
    Query(
      "q39_asof_join",
      Some("""
        WITH r AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                   FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, r.o_orderdate AS asof_orderdate,
               r.o_orderkey AS asof_orderkey
        FROM events e
        ASOF JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        ORDER BY e.event_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val right = t.orders.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      AsOfJoin.backward(
        t.events.select("event_id", "user_id", "ts"), right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderdate").as("asof_orderdate"),
          col("o_orderkey").as("asof_orderkey"))
        .orderBy(col("event_id"))
    }),

    // ---------------------------------------------------------------- q40
    // Pivot: average order price per year × priority (fixed pivot columns).
    Query(
      "q40_pivot",
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               ${(1 to 5).map(i => s"${sqlAvg(s"CASE WHEN o_orderpriority LIKE '$i-%' THEN o_totalprice END")} AS p$i").mkString(",\n               ")}
        FROM orders
        GROUP BY 1
        ORDER BY yr"""))((spark, dir) => {
      val t = Tables(spark, dir)
      // (avg via decimal detour for cross-engine determinism, as in Exact)
      val aggs = (1 to 5).map { i =>
        val c = when(col("o_orderpriority").like(s"$i-%"), col("o_totalprice"))
        davg(c).as(s"p$i")
      }
      t.orders
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("yr"))
    }),

    // ---------------------------------------------------------------- q41
    // CUBE: all grouping combinations incl. grand total.
    Query(
      "q41_cube",
      Some(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---------------------------------------------------------------- q42
    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`).
    Query(
      "q42_percentiles",
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               round(min(value), 6) AS vmin,
               round(max(value), 6) AS vmax
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.events.groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90"),
          round(percentile(col("value"), lit(0.99)), 6).as("p99"),
          round(min(col("value")), 6).as("vmin"),
          round(max(col("value")), 6).as("vmax"))
        .orderBy(col("event_type"))
    }),

    // ---------------------------------------------------------------- q55
    // Approximate percentiles (Greenwald-Khanna sketch) with a
    // rank-tolerance property oracle, the q12b pattern for estimators: the
    // sketch value must land between the EXACT interpolated percentiles at
    // rank ± 0.02 (accuracy 10000 bounds rank error at 1e-4, so the flag
    // has ~200x margin at any partitioning); exact columns + TRUE flags
    // are what the oracle reproduces.
    Query(
      "q55_approx_percentile",
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               round(quantile_cont(value, 0.9), 6) AS p90_exact,
               TRUE AS p50_ok, TRUE AS p90_ok
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.events.groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.5)), 6).as("p50_exact"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90_exact"),
          percentile_approx(col("value"), lit(0.5), lit(10000))
            .between(percentile(col("value"), lit(0.48)),
              percentile(col("value"), lit(0.52))).as("p50_ok"),
          percentile_approx(col("value"), lit(0.9), lit(10000))
            .between(percentile(col("value"), lit(0.88)),
              percentile(col("value"), lit(0.92))).as("p90_ok"))
        .orderBy(col("event_type"))
    }),

    // ---------------------------------------------------------------- q43
    // Lateral posexplode: token position table for a doc slice.
    Query(
      "q43_posexplode",
      Some("""
        SELECT * FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) + 1),
                   i -> {'pos': i - 1, 'token': toks[i]}), recursive := true)
          FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS toks
                FROM documents WHERE doc_id < 20))
        ORDER BY doc_id, pos"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.documents.filter(col("doc_id") < 20)
        .select(col("doc_id"), graft.util.TextPrep.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ---------------------------------------------------------------- q44
    // RANGE window frame: per-user running 1-hour event-value sum keyed on
    // epoch micros (decimal-routed for cross-engine bit equality).
    Query(
      "q44_range_frame",
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS hour_sum
        FROM events
        ORDER BY event_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-3600000000L, Window.currentRow)
      t.events.select(col("event_id"), col("user_id"),
        sum(col("value").cast(dec)).over(w).cast("double").as("hour_sum"))
        .orderBy(col("event_id"))
    }),

    // ---------------------------------------------------------------- q45
    // first/last/nth window values with explicit full-partition frames.
    Query(
      "q45_first_last_nth",
      Some("""
        SELECT o_orderkey, o_custkey,
               first_value(o_orderkey) OVER w AS first_ok,
               last_value(o_orderkey) OVER w AS last_ok,
               nth_value(o_orderkey, 2) OVER w AS second_ok
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t.orders.select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .orderBy(col("o_orderkey"))
    }),

    // ---------------------------------------------------------------- q46
    // Boolean/conditional aggregates: any/every/count_if equivalents.
    Query(
      "q46_bool_aggs",
      Some("""
        SELECT c_mktsegment,
               bool_or(c_acctbal < 0) AS has_negative,
               bool_and(c_acctbal > -1000) AS all_above_neg1000,
               CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_rich,
               COUNT(*) AS n
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.groupBy(col("c_mktsegment"))
        .agg(
          max(col("c_acctbal") < 0).as("has_negative"),
          min(col("c_acctbal") > -1000).as("all_above_neg1000"),
          count_if(col("c_acctbal") > 5000).as("n_rich"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---------------------------------------------------------------- q59
    // Salted two-stage aggregation (util.Skew): the manual mitigation for a
    // hot GROUP BY key drowning one reducer — partial on (key, salt), final
    // merge on key. l_returnflag has 3 values over the whole fact table:
    // exactly the shape that needs it at 100 TB. Algebraic aggregates +
    // decimal routing make the two-stage result EQUAL the direct group-by,
    // which is what the oracle (a plain GROUP BY) proves.
    Query(
      "q59_salted_agg",
      Some(s"""
        SELECT l_returnflag,
               ${sqlSum("l_quantity")} AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))((spark, dir) => {
      val t = Tables(spark, dir)
      graft.util.Skew.saltedAggregate(
          t.lineitem, Seq("l_returnflag"), col("l_orderkey"), n = 32,
          partial = Seq(sum(col("l_quantity").cast(dec)).as("sq"),
            count(lit(1)).as("c")),
          merge = Seq(round(sum(col("sq")).cast("double"), 4).as("sum_qty"),
            sum(col("c")).as("n")))
        .orderBy(col("l_returnflag"))
    }),

    // ---------------------------------------------------------------- q60
    // Typed UDAF top-k (functions.TopKAggregator): bounded k-sorted buffer
    // with partial aggregation — per-key top-k WITHOUT the per-key window
    // sort of q7 (whose partitionBy sort is the thing that dies on a hot
    // key at scale). Oracle is the ROW_NUMBER form; deterministic
    // tie-break (price DESC, orderkey ASC) on both sides.
    Query(
      "q60_topk_aggregator",
      Some("""
        SELECT o_orderpriority, rank, o_orderkey, price FROM (
          SELECT o_orderpriority,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rank,
                 o_orderkey, o_totalprice AS price
          FROM orders)
        WHERE rank <= 3
        ORDER BY o_orderpriority, rank"""))((spark, dir) => {
      import spark.implicits._
      val t = Tables(spark, dir)
      t.orders
        .select(col("o_orderpriority"), col("o_totalprice").cast("double"),
          col("o_orderkey").cast("long"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(new graft.functions.TopKAggregator(3).toColumn.name("tops"))
        .flatMap { case (prio, tops) =>
          tops.zipWithIndex.map { case ((price, key), i) =>
            (prio, i + 1, key, price)
          }
        }
        .toDF("o_orderpriority", "rank", "o_orderkey", "price")
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // ---------------------------------------------------------------- q65
    // Null semantics, pinned: null grouping keys form their own group,
    // COUNT(col) skips nulls while COUNT(*) does not, null-safe equality
    // (`<=>` / IS NOT DISTINCT FROM) treats null==null as true where plain
    // `=` yields null (excluded by count_if), and NULLS FIRST ordering.
    // These distinctions silently change results at any scale — the oracle
    // locks every one of them.
    Query(
      "q65_null_semantics",
      Some("""
        WITH x AS (SELECT
            CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
            CASE WHEN c_acctbal < 2500 THEN NULL ELSE c_mktsegment END AS seg2
          FROM customer)
        SELECT seg, COUNT(*) AS n_rows, COUNT(seg2) AS n_seg2,
               CAST(count_if(seg IS NOT DISTINCT FROM seg2) AS BIGINT) AS n_nullsafe_eq,
               CAST(count_if(seg = seg2) AS BIGINT) AS n_plain_eq
        FROM x GROUP BY seg
        ORDER BY seg NULLS FIRST"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.select(
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_mktsegment")).as("seg"),
          when(col("c_acctbal") < 2500, lit(null)).otherwise(col("c_mktsegment")).as("seg2"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("seg2")).as("n_seg2"),
          count_if(col("seg") <=> col("seg2")).as("n_nullsafe_eq"),
          count_if(col("seg") === col("seg2")).as("n_plain_eq"))
        .orderBy(col("seg").asc_nulls_first)
    }),

    // ---------------------------------------------------------------- q63
    // Ranking-function completion: dense_rank / percent_rank / cume_dist /
    // ntile (q7/q8/q44/q45 cover row_number, running frames, RANGE frames
    // and first/last/nth). Order key includes the unique o_orderkey, so
    // every function is tie-free deterministic; percent_rank and cume_dist
    // are exact small rationals, identical as doubles in both engines.
    Query(
      "q63_window_ranks",
      Some("""
        SELECT o_orderkey, o_orderpriority, dr, pr, cd, quartile FROM (
          SELECT o_orderkey, o_orderpriority,
                 dense_rank() OVER w AS dr,
                 round(percent_rank() OVER w, 6) AS pr,
                 round(cume_dist() OVER w, 6) AS cd,
                 ntile(4) OVER w AS quartile
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey))
        WHERE o_orderkey % 20 = 0
        ORDER BY o_orderkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders.select(col("o_orderkey"), col("o_orderpriority"),
          dense_rank().over(w).as("dr"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).as("quartile"))
        .filter(col("o_orderkey") % 20 === 0)
        .orderBy(col("o_orderkey"))
    }),

    // ---------------------------------------------------------------- q62
    // Six-table star join (TPC-H Q5 shape): the flagship multi-join —
    // Catalyst reorders the joins, broadcasts every dimension, and keeps
    // the lineitem fact as the probe side of a broadcast-hash chain; the
    // date filter pushes to the orders scan. Declared as plain joins, no
    // hints except the region broadcast: the optimizer does the physical
    // planning, which is the point.
    Query(
      "q62_star_join",
      Some(s"""
        SELECT n_name, ${sqlSum2("l_extendedprice", "(1 - l_discount)")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .groupBy(col("n_name"))
        .agg(dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ANALYZE-style column profiling: per-column row/null/distinct counts
    // and min/max in ONE pass over the fact table. `stack` widens each row
    // to (col_name, value) pairs, and map-side partial aggregation collapses
    // the 4x row blow-up before the single shuffle — the plan any stats
    // collector needs at 100 TB (one scan, one agg, no per-column jobs).
    Query(
      "q82_profile",
      Some("""
        WITH s AS (
          SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
          UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL SELECT 'l_discount', l_discount FROM lineitem
          UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        SELECT col_name, COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               MIN(v) AS min_v, MAX(v) AS max_v
        FROM s GROUP BY col_name
        ORDER BY col_name"""))((spark, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val stackExpr = s"stack(${cols.length}, " +
        cols.map(c => s"'$c', $c").mkString(", ") + ") AS (col_name, v)"
      Tables(spark, dir).lineitem
        .select(expr(stackExpr))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("v"))).as("n_null"),
          count_distinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("col_name"))
    }),

    // Native recursive CTE (Spark 4.x WITH RECURSIVE): sessionization by
    // walking each event's prev-pointer chain back to its session anchor.
    // The recursion is over a FUNCTIONAL graph (each event has exactly one
    // predecessor), so UNION ALL reaches each event once and terminates in
    // max-session-length rounds (bounded by the gap rule — 4 in this
    // data). Same gap semantics as q21 (epoch-µs, 30 min); the oracle is
    // DuckDB's recursive CTE of the identical shape — two engines running
    // the same declarative recursion.
    Query(
      "q88_recursive_sessions",
      Some("""
        WITH RECURSIVE evs AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pus,
                 LAG(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pid
          FROM events),
        chain (event_id, user_id, us, root) AS (
          SELECT event_id, user_id, us, event_id AS root FROM evs
          WHERE pus IS NULL OR us - pus > 1800000000
          UNION ALL
          SELECT e.event_id, e.user_id, e.us, c.root
          FROM evs e JOIN chain c
            ON e.pid = c.event_id AND e.user_id = c.user_id
          WHERE e.pus IS NOT NULL AND e.us - e.pus <= 1800000000)
        SELECT root AS session_id, user_id, COUNT(*) AS n_events,
               CAST(min(us) AS BIGINT) AS start_us,
               CAST(max(us) AS BIGINT) AS end_us
        FROM chain GROUP BY root, user_id
        ORDER BY session_id"""))((spark, dir) => {
      // Scale constant surfaced by the 10× full-corpus run (BENCH_sf1
      // triage): Spark's recursive-CTE runaway guard defaults to 1 M
      // TOTAL rows across iterations, and this recursion provably
      // touches each event exactly ONCE (functional prev-pointer graph),
      // so the guard trips on any corpus past 1 M events while the
      // recursion itself is linear and bounded by the session-gap rule.
      // Raise the row guard; keep the LEVEL guard (the true runaway
      // signal for a chain recursion) at its default. The raise is
      // SCOPED to a cloned session (isolated SQLConf, shared
      // SparkContext/cache): the frame executes lazily — after this
      // body returns — so a set/restore here could not cover the actual
      // run, while a frame BOUND to the clone carries the raised guard
      // to every consumption and leaves the shared session's runaway
      // guard at its default for all later queries.
      val s88 = spark.newSession()
      s88.conf.set("spark.sql.cteRecursionRowLimit", "2000000000")
      Tables(s88, dir).events.createOrReplaceTempView("g88_events")
      s88.sql("""
        WITH RECURSIVE evs AS (
          SELECT user_id, event_id,
                 unix_micros(CAST(ts AS TIMESTAMP)) AS us,
                 LAG(unix_micros(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pus,
                 LAG(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pid
          FROM g88_events),
        chain (event_id, user_id, us, root) AS (
          SELECT event_id, user_id, us, event_id AS root FROM evs
          WHERE pus IS NULL OR us - pus > 1800000000
          UNION ALL
          SELECT e.event_id, e.user_id, e.us, c.root
          FROM evs e JOIN chain c
            ON e.pid = c.event_id AND e.user_id = c.user_id
          WHERE e.pus IS NOT NULL AND e.us - e.pus <= 1800000000)
        SELECT root AS session_id, user_id, COUNT(*) AS n_events,
               CAST(min(us) AS BIGINT) AS start_us,
               CAST(max(us) AS BIGINT) AS end_us
        FROM chain GROUP BY root, user_id
        ORDER BY session_id""")
    }),

    // Last-observation-carried-forward backfill: per-user running
    // `last(value) IGNORE NULLS` window — the gap-fill every telemetry /
    // feature pipeline runs. Nulls are planted deterministically
    // (event_id % 7) so both engines fill the same holes; values are
    // carried verbatim (no arithmetic), so the match is exact. Leading
    // nulls (nothing to carry) stay null.
    Query(
      "q90_locf",
      Some("""
        WITH ev AS (SELECT user_id, event_id, ts,
                      CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
                    FROM events)
        SELECT user_id, event_id, v,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM ev
        ORDER BY user_id, event_id"""))((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(spark, dir).events.select(col("user_id"), col("event_id"),
        col("ts"), when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("v"), col("v_filled"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders per
    // customer expressed as the SQL-standard lateral join (both engines run
    // the same declarative text). Catalyst decorrelates this into a
    // window-rank under the hood — the per-key-LIMIT shape that would be a
    // hand-written row_number otherwise. Customers without orders drop
    // (inner lateral) in both engines.
    Query(
      "q92_lateral_topn",
      Some("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.createOrReplaceTempView("g92_customer")
      t.orders.createOrReplaceTempView("g92_orders")
      spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM g92_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM g92_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),

    // RFM segmentation done scale-correctly: per-customer
    // frequency/monetary in one shuffle, EXACT median thresholds as a
    // 1-row broadcast (q42's proven percentile), CASE-binning per row —
    // no global ranking window (an ntile over all customers would be one
    // giant partition). Decimal money sums keep thresholds engine-exact.
    Query(
      "q101_rfm",
      Some("""
        WITH cust AS (SELECT o_custkey, COUNT(*) AS freq,
                             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS money
                      FROM orders GROUP BY o_custkey),
        th AS (SELECT quantile_cont(freq, 0.5) AS f_med,
                      quantile_cont(money, 0.5) AS m_med FROM cust)
        SELECT CASE WHEN freq > f_med THEN 'F_hi' ELSE 'F_lo' END AS f_seg,
               CASE WHEN money > m_med THEN 'M_hi' ELSE 'M_lo' END AS m_seg,
               COUNT(*) AS n_customers,
               round(CAST(SUM(CAST(money AS DECIMAL(28,6))) AS DOUBLE), 2) AS seg_revenue
        FROM cust CROSS JOIN th
        GROUP BY 1, 2 ORDER BY f_seg, m_seg"""))((spark, dir) => {
      val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
      val d6 = org.apache.spark.sql.types.DecimalType(28, 6)
      val cust = Tables(spark, dir).orders
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast(d2)).cast("double").as("money"))
      val th = cust.agg(percentile(col("freq"), lit(0.5)).as("f_med"),
        percentile(col("money"), lit(0.5)).as("m_med"))
      cust.crossJoin(broadcast(th))
        .select(
          when(col("freq") > col("f_med"), "F_hi").otherwise("F_lo").as("f_seg"),
          when(col("money") > col("m_med"), "M_hi").otherwise("M_lo").as("m_seg"),
          col("money"))
        .groupBy(col("f_seg"), col("m_seg"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("money").cast(d6)).cast("double"), 2).as("seg_revenue"))
        .orderBy(col("f_seg"), col("m_seg"))
    }),

    // Market-basket co-purchase pairs: parts bought together in one order,
    // ranked by support. The pair join is keyed on the order (the natural
    // blocking key — baskets are small, so pairs per order are bounded);
    // one equi-join + one count shuffle, TakeOrderedAndProject top-k.
    Query(
      "q102_copurchase",
      Some("""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 20"""))((spark, dir) => {
      // distinct + self-join, deliberately: the basket-collect form was
      // tried in r13 and reverted on 10× evidence — see the
      // Graph.coOccurrenceEdges note (ObjectHashAggregate sort fallback
      // past 128 keys makes collect_set a sort-aggregate at scale)
      val b = Tables(spark, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      b.as("a").join(b.as("c"),
          col("a.l_orderkey") === col("c.l_orderkey") &&
          col("a.l_partkey") < col("c.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("c.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b")).limit(20)
    })
  )
}
