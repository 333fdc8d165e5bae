package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Interop shim for graft's native Catalyst expressions.
  *
  * Spark 4 split `Column` from `Expression` (Spark Connect support) and made
  * the converters `private[sql]`; a library adding its own expressions needs
  * this two-line bridge in the `org.apache.spark.sql` package — the same
  * pattern third-party Spark extensions (Delta, Sedona, etc.) use.
  */
object GraftInterop {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
