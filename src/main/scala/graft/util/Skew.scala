package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §2.3 / the 100 TB design rules).
  *
  * AQE handles skewed sort-merge JOINS at runtime; skewed AGGREGATIONS
  * (one hot group key drowning a reducer) still need manual salting when
  * the aggregate is algebraic. [[saltedAggregate]] runs the classic
  * two-stage shape: group on (keys, salt) for the parallel partial, then
  * on keys for the final — both stages are ordinary hash aggregates, so
  * results are identical to the direct groupBy for algebraic aggregates
  * (sum/count/min/max — pass the merge form for the second stage).
  */
object Skew {

  /** Deterministic salt in [0, n) derived from stable row content. */
  def salt(c: Column, n: Int): Column = pmod(crc32(c.cast("string")), lit(n))

  /** Two-stage salted aggregation.
    *
    * @param df        input
    * @param keys      real group keys
    * @param saltFrom  column whose hash spreads the hot keys (e.g. a
    *                  high-cardinality id column)
    * @param n         fan-out per key
    * @param partial   aggregates for stage 1, e.g. `sum(x) as sx`
    * @param merge     stage-2 merge of the partials, e.g. `sum(sx) as sx`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Column, n: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val stage1 = df.withColumn("_salt", salt(saltFrom, n))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }
}
