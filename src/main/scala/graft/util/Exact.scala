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
  /** Exact sum of a double column: decimal-widen, sum, back to double,
    * reported at 4 dp. The final rounding absorbs the decimal→double
    * conversion: for sums beyond 15 significant digits the conversion is
    * correctly rounded in Spark (BigDecimal.doubleValue) but can be ~2 ulp
    * off in engines that convert via int128→double×10⁻ˢ (observed 1-ulp
    * q1 mismatch vs DuckDB at sf0.1); 4 dp granularity (5e-5) is orders
    * above that noise while keeping every semantic digit of scale-4 data.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(18, scale))).cast("double"), 4)

  /** Exact average: exact decimal sum, one double division at the end,
    * rounded to 6 dp. The rounding matters at scale: converting a >15-digit
    * decimal sum to double is correctly rounded in Spark but can be 1 ulp
    * off in other engines, and the division propagates it — observed as a
    * q1 near-miss at sf0.1. 6 dp is far above the ulp and far below any
    * value of interest.
    */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(18, scale))).cast("double") / count(c), 6)

  /** Exact product-sum, e.g. revenue = sum(price * (1 - discount)).
    * Both operands are decimal-widened before multiplying, so the product
    * is exact and the sum order-independent.
    */
  def dsum2(a: Column, b: Column, scale: Int = 4): Column =
    round(sum(a.cast(DecimalType(18, scale)) * b.cast(DecimalType(18, scale))).cast("double"), 4)

  /** SQL fragment equivalents, for building DuckDB oracle strings. */
  def sqlSum(expr: String, scale: Int = 4): String =
    s"round(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE), 4)"
  def sqlAvg(expr: String, scale: Int = 4): String =
    s"round(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr), 6)"
  def sqlSum2(a: String, b: String, scale: Int = 4): String =
    s"round(CAST(SUM(CAST($a AS DECIMAL(18,$scale)) * CAST($b AS DECIMAL(18,$scale))) AS DOUBLE), 4)"
}
