package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent exact aggregation helpers.
  *
  * Summing doubles is order-dependent, and the order of partial aggregates
  * depends on partitioning — so a plain `sum(double)` can produce different
  * low-order bits on 32 shuffle partitions vs 1000 executors, and will not
  * hash-match a single-threaded oracle. Routing the values through a fixed-
  * scale decimal makes the aggregation exact and therefore independent of
  * partitioning, task order, and cluster size. The oracle SQL mirrors the
  * same cast (`CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`), so results
  * match bit-for-bit at any scale factor. This is the 100 TB-safe way to
  * declare deterministic numeric results.
  */
object Exact {
  /** Exact sum of a double column: decimal-widen, sum, back to double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average (sum/count in double at the very end). */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c))

  /** Exact product-sum, e.g. revenue = sum(price * (1 - discount)).
    * Both operands are decimal-widened before multiplying, so the product
    * is exact and the sum order-independent.
    */
  def dsum2(a: Column, b: Column, scale: Int = 4): Column =
    sum(a.cast(DecimalType(18, scale)) * b.cast(DecimalType(18, scale))).cast("double")

  /** SQL fragment equivalents, for building DuckDB oracle strings. */
  def sqlSum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlAvg(expr: String, scale: Int = 4): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr))"
  def sqlSum2(a: String, b: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($a AS DECIMAL(18,$scale)) * CAST($b AS DECIMAL(18,$scale))) AS DOUBLE)"
}
