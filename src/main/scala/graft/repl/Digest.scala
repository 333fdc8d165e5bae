package graft.repl

import graft.util.TextPrep.h48
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-level replica verification by bucketed row digests — the step
  * BEYOND the reference's watermark equality check (`hive3repl.sh:106-120`
  * compares only `last_repl_id`s): two tables with equal watermarks can
  * still diverge (bit rot, a partial manual fix, an out-of-band write), and
  * at 100 TB you cannot diff rows across clusters. Instead each side
  * reduces every row to a 48-bit hash and XOR-folds the hashes per key
  * bucket: XOR is commutative/associative ⇒ the digest is independent of
  * partitioning and row order, and a single-bucket mismatch scopes the
  * repair to 1/`buckets` of the table (re-dump just that key range).
  *
  * One map-side-combinable shuffle per table, constant-size result
  * (buckets × 3 longs) — the comparison itself is driver-trivial.
  * XOR cancels duplicate pairs, so `n_rows` rides along: a digest
  * collision now needs equal counts AND a 48-bit xor collision.
  */
object Digest {

  /** Per-bucket (bucket, n_rows, xor_digest) of `cols`, bucketed by
    * `pmod(h48(key), buckets)` so any key type distributes.
    */
  def tableDigest(df: DataFrame, keyCol: Column, cols: Seq[Column],
                  buckets: Int = 64): DataFrame =
    df.select(
        pmod(h48(keyCol.cast("string")), lit(buckets.toLong)).as("bucket"),
        h48(concat_ws("|", cols: _*)).as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_digest"))

  /** Buckets where two digest frames disagree (empty ⇒ content-equal). */
  def divergentBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.withColumnRenamed("n_rows", "n_rows_b")
      .withColumnRenamed("xor_digest", "xor_digest_b")
    a.join(bb, Seq("bucket"), "full_outer")
      .filter(not(col("n_rows") <=> col("n_rows_b")) ||
        not(col("xor_digest") <=> col("xor_digest_b")))
      .select(col("bucket"))
  }
}
