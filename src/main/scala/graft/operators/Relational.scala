package graft.operators

import graft.{Query, Tables}
import graft.util.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

/** The relational query corpus — the full Spark-SQL-shaped operator surface
  * the reference's replicated Hive databases imply (SURVEY.md §2.3):
  * scan/filter/project, all join types, hash aggregation, window functions,
  * top-k, set ops, rollup, scalar/string/date/math/JSON/array functions,
  * scalar subqueries, HAVING.
  *
  * Scale notes (100 TB design):
  *  - dimension joins (`nation`, `region`, `supplier`) are explicitly
  *    `broadcast()` — no shuffle of the fact table for small dims;
  *  - fact-fact joins (lineitem ⋈ orders) are plain equi-joins so Catalyst
  *    plans sort-merge with both sides hash-partitioned on the key, and AQE
  *    can switch to shuffled-hash / handle skew at runtime;
  *  - every aggregate is partial (map-side) + final by construction
  *    (`HashAggregateExec` pairs) — nothing here collects to the driver;
  *  - double sums go through fixed-scale decimals (see [[graft.util.Exact]])
  *    so results are bit-identical regardless of partitioning/cluster size;
  *  - top-k is `orderBy().limit()` which Spark plans as
  *    `TakeOrderedAndProject` (per-partition heap + driver merge of k rows,
  *    never a global sort).
  */
object Relational {

  private def tsNtz(s: String) = lit(s).cast(TimestampNTZType)
  private val dec = DecimalType(18, 4)

  val queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q1
    // TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    Query(
      "q1_pricing_summary",
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlSum("l_quantity")} AS sum_qty,
               ${sqlSum("l_extendedprice")} AS sum_base_price,
               ${sqlSum2("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
               ${sqlAvg("l_quantity")} AS avg_qty,
               ${sqlAvg("l_extendedprice")} AS avg_price,
               ${sqlAvg("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .filter(col("l_shipdate") <= tsNtz("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---------------------------------------------------------------- q2
    // Pure row-level filter + projection: pushdown-friendly; per-row double
    // arithmetic is IEEE-deterministic so no decimal detour needed.
    Query(
      "q2_filter_project",
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount > 0.05 AND l_quantity < 10
        ORDER BY l_orderkey, l_linenumber"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .filter(
          col("l_shipdate") >= tsNtz("1995-01-01 00:00:00") &&
          col("l_shipdate") < tsNtz("1996-01-01 00:00:00") &&
          col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---------------------------------------------------------------- q3
    // Multi-way join: fact ⋈ fact sort-merge + broadcast dims, then agg.
    Query(
      "q3_revenue_by_nation",
      Some(s"""
        SELECT n_name,
               ${sqlSum2("l_extendedprice", "1 - l_discount")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // ---------------------------------------------------------------- q4
    // Semi join (EXISTS): orders having a heavy lineitem.
    Query(
      "q4_semi_join",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .join(
          t.lineitem.filter(col("l_quantity") >= 45).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---------------------------------------------------------------- q5
    // Anti join (NOT EXISTS): customers with no high-value order.
    Query(
      "q5_anti_join",
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 300000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---------------------------------------------------------------- q6
    // Outer join + two-level aggregation (TPC-H Q13 shape).
    Query(
      "q6_outer_join_histogram",
      Some("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---------------------------------------------------------------- q7
    // Window: row_number top-3 orders per customer (deterministic tiebreak).
    Query(
      "q7_window_topk_per_key",
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t
        WHERE rn <= 3
        ORDER BY o_custkey, rn"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t.orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ---------------------------------------------------------------- q8
    // Window: running sum + lag over a fully-deterministic ordering.
    // NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    // at sf0.1+, and one pair even ties on shipdate with different
    // quantities — a ROWS frame is order-ambiguous on ties, so l_quantity
    // joins the sort key (identical leftover ties then can't change sums).
    Query(
      "q8_running_sum",
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_qty,
               LAG(l_orderkey) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS prev_orderkey
        FROM lineitem
        ORDER BY l_suppkey, l_orderkey, l_linenumber"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      t.lineitem.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast(dec))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"),
        lag(col("l_orderkey"), 1).over(w).as("prev_orderkey"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // ---------------------------------------------------------------- q9
    // Top-k: planned as TakeOrderedAndProject (no global sort).
    Query(
      "q9_topk_orders",
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---------------------------------------------------------------- q10
    // Set ops: INTERSECT / EXCEPT / UNION ALL over yearly customer sets.
    Query(
      "q10_set_ops",
      Some("""
        WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                       AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
             c96 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
        UNION ALL
        SELECT 'only_95' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)
        UNION ALL
        SELECT 'only_96' AS tag, o_custkey FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c95)
        ORDER BY tag, o_custkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      def year(y: String, y1: String) = t.orders
        .filter(col("o_orderdate") >= tsNtz(y) && col("o_orderdate") < tsNtz(y1))
        .select(col("o_custkey")).distinct()
      val c95 = year("1995-01-01 00:00:00", "1996-01-01 00:00:00")
      val c96 = year("1996-01-01 00:00:00", "1997-01-01 00:00:00")
      c95.intersect(c96).select(lit("both").as("tag"), col("o_custkey"))
        .unionAll(c95.except(c96).select(lit("only_95").as("tag"), col("o_custkey")))
        .unionAll(c96.except(c95).select(lit("only_96").as("tag"), col("o_custkey")))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    // ---------------------------------------------------------------- q11
    // ROLLUP: multi-level aggregation with grouping nulls.
    Query(
      "q11_rollup",
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
               COUNT(*) AS n_orders,
               ${sqlSum("o_totalprice")} AS total_price
        FROM orders
        GROUP BY ROLLUP(CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
        ORDER BY yr NULLS FIRST, o_orderpriority NULLS FIRST"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .rollup(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("yr").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // ---------------------------------------------------------------- q52
    // GROUPING SETS — the third grouping-analytics form beside rollup (q11)
    // and cube (q41): an explicit, non-hierarchical list of grouping keys.
    // Same single-pass Expand-based plan as rollup/cube — each input row
    // fans out once per set, partial aggregation stays map-side.
    Query(
      "q52_grouping_sets",
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
               COUNT(*) AS n_orders,
               ${sqlSum("o_totalprice")} AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((CAST(year(o_orderdate) AS INTEGER)), (o_orderpriority), ())
        ORDER BY yr NULLS FIRST, o_orderpriority NULLS FIRST"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .select(year(col("o_orderdate")).as("yr"), col("o_orderpriority"),
          col("o_totalprice"))
        .groupingSets(
          Seq(Seq(col("yr")), Seq(col("o_orderpriority")), Seq.empty),
          col("yr"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("yr").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // ---------------------------------------------------------------- q12
    // Distinct aggregation (exact). The HLL approximate variant is
    // q12b below (rows-only check: approx output is engine-specific).
    Query(
      "q12_count_distinct",
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // approx_count_distinct is HLL++-based and engine-specific, so its raw
    // estimate has no cross-engine oracle; the checkable contract is the
    // estimator's accuracy bound. The query emits the exact distinct count
    // plus a boolean asserting the HLL estimate lands within 5× the
    // configured 1-sigma rsd (0.05) — deterministic for a working sketch
    // (HLL merge is associative/commutative, so the estimate is identical
    // at any partitioning) — and the oracle expects the flag TRUE.
    Query(
      "q12b_approx_distinct",
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n_rows,
               TRUE AS approx_within_tol
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"),
          (abs(approx_count_distinct(col("l_partkey"), 0.05).cast("double") /
            countDistinct(col("l_partkey")) - 1.0) <= 0.25).as("approx_within_tol"))
        .orderBy(col("l_returnflag"))
    }),

    // ---------------------------------------------------------------- q13
    // String functions: upper/length/substring/concat/trim/regexp/split.
    Query(
      "q13_string_fns",
      Some("""
        SELECT p_partkey,
               upper(p_name) AS uname,
               length(p_name) AS name_len,
               substring(p_name, 1, 8) AS prefix,
               concat(p_brand, '#', p_type) AS brand_type,
               regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
               regexp_replace(p_name, ' ', '_', 'g') AS snake,
               string_split(p_name, ' ')[1] AS first_word
        FROM part
        WHERE p_name LIKE '%e%'
        ORDER BY p_partkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.part
        .filter(col("p_name").like("%e%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 8).as("prefix"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy(col("p_partkey"))
    }),

    // ---------------------------------------------------------------- q14
    // Date/time functions: year/month/date_trunc/min/max.
    Query(
      "q14_date_fns",
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mon,
               COUNT(*) AS n_orders,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS last_order,
               min(date_trunc('month', o_orderdate)) AS month_start
        FROM orders
        GROUP BY 1, 2
        ORDER BY yr, mon"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          min(date_trunc("month", col("o_orderdate")).cast(TimestampNTZType)).as("month_start"))
        .orderBy(col("yr"), col("mon"))
    }),

    // ---------------------------------------------------------------- q15
    // Math + CASE: abs/sqrt/round/ceil/floor/ln with a bucketing CASE.
    // sqrt is IEEE-correctly-rounded (bitwise portable); ln is rounded to
    // 6dp to absorb possible 1-ulp libm differences across engines.
    // round() on a raw DOUBLE is engine-divergent at exact .x5 ties (Spark
    // rounds the true binary value via BigDecimal HALF_UP; DuckDB scales by
    // 10 in floating point first), so both sides widen to DECIMAL(12,2) —
    // the input's true scale — before rounding, then cast back to DOUBLE.
    // Same pattern as util/Exact for sums. Spark's ceil/floor on DOUBLE
    // return BIGINT while DuckDB's return DOUBLE — the oracle casts to
    // BIGINT so the driver's value-string hash sees "1011" on both sides,
    // not "1011" vs "1011.0" (r1–r3 hash-fail root cause).
    Query(
      "q15_math_case",
      Some("""
        SELECT c_custkey,
               CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS bal_r1,
               abs(c_acctbal) AS bal_abs,
               sqrt(abs(c_acctbal)) AS bal_sqrt,
               round(ln(abs(c_acctbal) + 1), 6) AS bal_ln,
               CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
               CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bucket
        FROM customer
        ORDER BY c_custkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.customer.select(
        col("c_custkey"),
        round(col("c_acctbal").cast(DecimalType(12, 2)), 1).cast("double").as("bal_r1"),
        abs(col("c_acctbal")).as("bal_abs"),
        sqrt(abs(col("c_acctbal"))).as("bal_sqrt"),
        round(log(abs(col("c_acctbal")) + 1), 6).as("bal_ln"),
        ceil(col("c_acctbal")).as("bal_ceil"),
        floor(col("c_acctbal")).as("bal_floor"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bucket"))
        .orderBy(col("c_custkey"))
    }),

    // ---------------------------------------------------------------- q16
    // JSON extraction from the events.props column + aggregation.
    Query(
      "q16_json_extract",
      Some("""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
               min(CAST(props->>'$.k' AS INTEGER)) AS min_k,
               max(CAST(props->>'$.k' AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val k = get_json_object(col("props"), "$.k").cast("int")
      t.events.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          min(k).as("min_k"),
          max(k).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ---------------------------------------------------------------- q17
    // Array/higher-order functions over the embedding vector column.
    Query(
      "q17_array_fns",
      Some("""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm2
        FROM embeddings
        ORDER BY vec_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.embeddings.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("norm2"))
        .orderBy(col("vec_id"))
    }),

    // ---------------------------------------------------------------- q18
    // Scalar subquery: orders 50% above the global average price.
    Query(
      "q18_scalar_subquery",
      Some(s"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT ${sqlAvg("o_totalprice")} FROM orders)
        ORDER BY o_orderkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val avgP = t.orders.agg(davg(col("o_totalprice")).as("avg_price"))
      t.orders
        .crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---------------------------------------------------------------- q19
    // HAVING: suppliers above a revenue threshold.
    Query(
      "q19_having",
      Some(s"""
        SELECT l_suppkey,
               ${sqlSum2("l_extendedprice", "1 - l_discount")} AS total_rev,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_suppkey
        HAVING ${sqlSum2("l_extendedprice", "1 - l_discount")} > 100000
        ORDER BY l_suppkey"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem.groupBy(col("l_suppkey"))
        .agg(
          dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("total_rev"),
          count(lit(1)).as("n_items"))
        .filter(col("total_rev") > 100000)
        .orderBy(col("l_suppkey"))
    }),

    // ---------------------------------------------------------------- q20
    // Event-time tumbling-window aggregation (batch form; the streaming
    // form lives in graft.streaming with the same grouping).
    Query(
      "q20_events_hourly",
      Some(s"""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               COUNT(*) AS n,
               ${sqlSum("value")} AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy(
          date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---------------------------------------------------------------- q21
    // Sessionization: gap-based sessions via window lag + running sum —
    // the batch equivalent of streaming session windows.
    Query(
      "q21_sessionization",
      Some("""
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000000 THEN 1
                      WHEN LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                      ELSE 0 END AS is_new
          FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events) e),
        sessions AS (
          SELECT user_id, event_id,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked)
        SELECT user_id,
               CAST(max(session_id) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id
        ORDER BY user_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tsUs = unix_micros(col("ts").cast("timestamp"))
      val prevUs = lag(tsUs, 1).over(w)
      val isNew = when(prevUs.isNull, 1)
        .when(tsUs - prevUs > 1800000000L, 1)
        .otherwise(0)
      t.events
        .select(col("user_id"), col("ts"), col("event_id"), isNew.as("is_new"))
        .withColumn("session_id",
          sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )
}
