package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A materialized, versioned dataset with idempotent micro-batch commits —
  * the storage core shared by the streamed-view maintainers
  * ([[graft.streaming.ViewMaintenance]],
  * [[graft.streaming.Scd2Maintenance]]).
  *
  * Layout: `dir/view_v<N>` parquet per version; `dir/CURRENT` one-line
  * pointer `"<batchId>,<version>"` swapped via [[AtomicPointer]] (OVERWRITE
  * rename — no crash instant without a pointer). A replayed batch
  * (`batchId <= committed`) is a no-op; a crash between the version write
  * and the pointer swap replays by overwriting the same version directory.
  * After each commit, ALL versions `<= current - keepVersions` are pruned
  * (listing makes the cleanup self-healing if a past prune was
  * crash-skipped).
  *
  * Single-writer is ENFORCED: every commit holds the dir's advisory
  * [[WriterLock]]; a second maintainer on the same dir fails fast with a
  * [[graft.repl.LockBusyException]] instead of silently racing the
  * pointer swap.
  *
  * Reader contract: a DataFrame from `read()` stays valid for
  * `keepVersions - 1` further commits before its files can be pruned — an
  * external server holding views across triggers should raise
  * `keepVersions` to cover its longest read (or retry on
  * FileNotFoundException); the default 2 covers the maintainers' own
  * read-merge-commit cycle plus one commit of external grace.
  */
final case class VersionedView(spark: SparkSession, dir: String,
                               keepVersions: Int = 2,
                               writerLockStaleMs: Long = 15 * 60 * 1000L) {
  require(keepVersions >= 1, "keepVersions must be >= 1")

  private def conf = spark.sparkContext.hadoopConfiguration
  private def pointer = new Path(dir, "CURRENT")
  private val ownerId = java.util.UUID.randomUUID.toString

  /** (committedBatchId, version), or None before the first commit. */
  def committed: Option[(Long, Long)] =
    AtomicPointer.read(conf, pointer)
      .map { s => val Array(b, v) = s.split(","); (b.toLong, v.toLong) }

  /** The view at a known commit state (None = not yet materialized). */
  def readAt(cur: Option[(Long, Long)]): Option[DataFrame] =
    cur.map { case (_, v) => spark.read.parquet(s"$dir/view_v$v") }

  /** The current view, or None before the first commit. */
  def read(): Option[DataFrame] = readAt(committed)

  /** Apply one micro-batch: `fn` maps the current view (None on the first
    * batch) to the next one. Skips replayed batches; commits atomically;
    * prunes old versions. Returns true iff the batch was applied.
    */
  def applyBatch(batchId: Long)(fn: Option[DataFrame] => DataFrame): Boolean = {
    val lock = WriterLock.acquire(spark, dir, ownerId, writerLockStaleMs)
    try applyLocked(batchId)(fn) finally lock.release()
  }

  private def applyLocked(batchId: Long)(fn: Option[DataFrame] => DataFrame): Boolean = {
    val cur = committed // read ONCE per batch (guards pointer + view read)
    if (cur.exists(_._1 >= batchId)) return false
    val next = fn(readAt(cur))
    val newV = cur.map(_._2 + 1).getOrElse(0L)
    next.write.mode("overwrite").parquet(s"$dir/view_v$newV")
    AtomicPointer.commit(conf, pointer, s"$batchId,$newV")
    val f = new Path(dir).getFileSystem(conf)
    f.globStatus(new Path(dir, "view_v*")).foreach { st =>
      val v = st.getPath.getName.stripPrefix("view_v")
      if (v.forall(_.isDigit) && v.toLong <= newV - keepVersions)
        f.delete(st.getPath, true)
    }
    true
  }
}
