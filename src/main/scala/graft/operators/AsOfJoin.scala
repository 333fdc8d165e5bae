package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark's join surface lacks natively.
  *
  * For every left row, attach the single right row with the greatest
  * `rightTime <= leftTime` within the same key (DuckDB/kdb ASOF JOIN
  * semantics, inner variant).
  *
  * Spark-first implementation: instead of a range join (which Catalyst
  * plans as a broadcast-nested-loop or an exploding theta join), the two
  * sides are UNIONED and sorted once per key — right rows carry their
  * payload, left rows carry null — and `last(payload, ignoreNulls)` over a
  * (key, time)-ordered running window picks each left row's most recent
  * right payload. Cost: ONE shuffle of |L|+|R| rows on the key, no
  * quadratic candidate pairs, AQE-skew-splittable — the plan you want at
  * 100 TB. Right rows must be unique per (key, time); pre-aggregate to
  * enforce (deterministically) if not.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side, unique per (key, time)
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right columns to attach
    * @return left rows (all columns) + payload columns of the as-of match;
    *         left rows with no earlier right row are DROPPED (inner asof)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = struct((rightTime +: payload).map(right(_)): _*)

    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(
        right.select((rightTime +: payload).map(right(_)): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))))
    val r = right
      .select(col(rightKey).as("_k"), col(rightTime).as("_t"),
        lit(0).as("_side"), pay.as("_pay"))
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_match").isNotNull)
      .select(leftCols.map(col) ++ (rightTime +: payload).map(p => col(s"_match.$p")): _*)
  }
}
