package graft.repl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** External-table replication: distributed copy-if-changed file sync — the
  * engine's form of the reference's distcp-based external-table path
  * (`/root/reference/HQL/replextload.hql:5-11`: 128 threads, 500 copy
  * tasks, `distcp -update -skipcrccheck -pugprb`;
  * `beeline_functions.sh:203-209` selects it when
  * `INCLUDE_EXTERNAL_TABLES=true`).
  *
  * Semantics of `-update` (copy only if changed) are re-created by
  * comparing (size, mtime) manifests of source and target; the copy itself
  * runs as Spark tasks over the file list (`parallelize(files).map(copy)`),
  * so parallelism is the cluster's task parallelism — the knob the
  * reference sets to 128/500 is just `numSlices` here. File lists are
  * DataFrames end-to-end: at 100 TB a directory can hold millions of
  * files, and the diff is a join, not a driver loop; only the final copy
  * list for THIS delta is materialized to tasks.
  */
object ExtCopy {

  /** Recursive file manifest of a directory as (rel_path, size, mtime). */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(new Path(dir))
    // NOTE: string-prefix relativization, not URI.relativize — the latter
    // silently returns the ABSOLUTE uri when the base lacks a trailing
    // slash, which would make the copy write sources onto themselves.
    val prefix = base.toString + "/"
    val out = Seq.newBuilder[(String, Long, Long)]
    if (fs.exists(base)) {
      val it = fs.listFiles(base, true)
      while (it.hasNext) {
        val f = it.next()
        val full = f.getPath.toString
        require(full.startsWith(prefix), s"$full outside $prefix")
        out += ((full.substring(prefix.length), f.getLen, f.getModificationTime))
      }
    }
    out.result().toDF("rel_path", "size", "mtime")
  }

  /** Files present in `src` but missing or different (size or newer mtime)
    * in `dst` — the `-update` predicate.
    */
  def diff(src: DataFrame, dst: DataFrame): DataFrame =
    src.as("s").join(dst.as("d"), col("s.rel_path") === col("d.rel_path"), "left")
      .filter(col("d.rel_path").isNull ||
        col("s.size") =!= col("d.size") || col("s.mtime") > col("d.mtime"))
      .select(col("s.rel_path").as("rel_path"))

  /** Distributed copy of `files` (rel paths) from srcDir to dstDir.
    * Returns (copied, skipped) counts. Idempotent: re-running after a
    * partial failure re-diffs and copies only what is still missing.
    */
  def sync(spark: SparkSession, srcDir: String, dstDir: String,
           parallelism: Int = 32): (Long, Long) = {
    val src = listFiles(spark, srcDir)
    val dst = listFiles(spark, dstDir)
    val toCopy = diff(src, dst).collect().map(_.getString(0)) // delta only
    val total = src.count()
    if (toCopy.nonEmpty) {
      val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
      val srcB = srcDir
      val dstB = dstDir
      spark.sparkContext
        .parallelize(toCopy.toIndexedSeq, math.min(parallelism, toCopy.length))
        .foreach { rel =>
          val c: Configuration = conf.value
          val from = new Path(srcB, rel)
          val to = new Path(dstB, rel)
          val sfs = from.getFileSystem(c)
          val tfs = to.getFileSystem(c)
          tfs.mkdirs(to.getParent)
          val in = sfs.open(from)
          try {
            val out = tfs.create(to, true)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
            } finally out.close()
          } finally in.close()
          // preserve mtime so the next -update diff sees them equal
          tfs.setTimes(to, sfs.getFileStatus(from).getModificationTime, -1)
        }
    }
    (toCopy.length.toLong, total - toCopy.length)
  }
}
