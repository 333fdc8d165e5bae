package graft.repl

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Target-side replication metadata: the per-db watermark (`last_repl_id`)
  * and the run log.
  *
  * The watermark read is the engine's `REPL STATUS`
  * (`/root/reference/HQL/replstatus.hql:1-4`, parsed at
  * `/root/reference/beeline_functions.sh:3-25`): `None` means "never
  * replicated" — the reference's `NULL` branch that selects bootstrap
  * (`/root/reference/hive3repl.sh:83-85`).
  *
  * The commit is atomic (write temp + rename) so a load that dies mid-way
  * leaves the previous watermark intact and a retry replays the same delta —
  * replay is idempotent (see [[DbCatalog.Event]]), so this gives
  * exactly-once *effect* with at-least-once execution, the same contract the
  * reference gets from Hive REPL + its rerun loop
  * (`/root/reference/beeline_functions.sh:212-236`).
  */
final case class MetadataStore(spark: SparkSession, targetRoot: String) {

  private def fs: FileSystem =
    new Path(targetRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def wmPath(db: String) = new Path(targetRoot, s"_repl_metadata/$db/watermark")

  /** Post/pre-load watermark; None = never replicated. */
  def watermark(db: String): Option[Long] =
    graft.util.AtomicPointer.read(spark.sparkContext.hadoopConfiguration,
      wmPath(db)).map(_.toLong)

  /** Atomically commit the watermark via [[graft.util.AtomicPointer]]
    * (write `watermark.tmp`, OVERWRITE-rename over the old file — atomic on
    * HDFS and the local fs, with no instant at which the watermark is
    * missing; a crash mid-commit leaves old or new, never neither, so a
    * restart can never mistake a replicated db for a bootstrap candidate).
    * On object stores the engine would swap this for a conditional put —
    * the call-site contract (commit LAST, after all data is applied) is
    * what matters.
    */
  def commitWatermark(db: String, id: Long): Unit =
    graft.util.AtomicPointer.commit(spark.sparkContext.hadoopConfiguration,
      wmPath(db), id.toString)

  /** Append a run report to the engine run log (newline-delimited JSON file
    * per run — tiny control-plane records, kept out of the data plane).
    */
  def logRun(r: RunReport): Unit = {
    val p = new Path(targetRoot, s"_repl_metadata/${r.db}/runs/${System.nanoTime()}.json")
    fs.mkdirs(p.getParent)
    val json = r.json
    val out = fs.create(p, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
