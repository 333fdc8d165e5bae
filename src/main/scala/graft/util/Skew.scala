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

  /** Salted equi-join for a skewed join key. The probe (large/skewed) side
    * gets a deterministic content-derived salt in [0, n); the build side is
    * replicated n times, one copy per salt value; the join keys on
    * (key, salt). Each hot key's rows therefore spread across n reducers
    * instead of drowning one — the manual form of AQE's skew-join split,
    * for when the build side is too big to broadcast but small enough to
    * replicate n×, or when the engine must guarantee the spread at plan
    * time (AQE only reacts to skew it can see in map output sizes).
    * Row-for-row identical to `probe.join(build, probeKey === buildKey)` —
    * including when `saltFrom` is null: crc32(null) is null, which would
    * make the salt equality never match and silently DROP the row, so null
    * salts are routed to reducer 0 (correct, just unspread).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: Column, buildKey: Column,
                 saltFrom: Column, n: Int): DataFrame = {
    val (saltP, saltB) = ("_graft_salt_p", "_graft_salt_b")
    require(!probe.columns.contains(saltP) && !build.columns.contains(saltB),
      s"input already has a $saltP/$saltB column")
    val salted = probe.withColumn(saltP,
      coalesce(salt(saltFrom, n), lit(0)).cast("int"))
    val replicated = build.withColumn(saltB,
      explode(typedLit((0 until n).toArray)))
    salted
      .join(replicated, probeKey === buildKey && col(saltP) === col(saltB))
      .drop(saltP, saltB)
  }

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
    require(!df.columns.contains("_graft_salt"),
      "input already has a _graft_salt column")
    val stage1 = df.withColumn("_graft_salt", salt(saltFrom, n))
      .groupBy((keys.map(col) :+ col("_graft_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }
}
