package graft.repl

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** A second "cluster": RawLocalFileSystem re-rooted under the `srcfs:`
  * scheme. Registering it as `fs.srcfs.impl` gives paths under `srcfs:` a
  * genuinely DISTINCT FileSystem instance (different scheme → different
  * cache slot → different class), which is how a single-host test exercises
  * the reference's two-cluster addressing (`SOURCE_HDFS_PREFIX`,
  * `/root/reference/env.sh:18`) without a second HDFS.
  */
class SrcClusterFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("srcfs:///")

  /** RawLocal's lazy permission loader does `new java.io.File(uri)`, which
    * rejects the srcfs: scheme — materialize statuses with default
    * permissions instead (permission fidelity is not what this double-
    * namespace harness tests).
    */
  override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus = {
    val s = super.getFileStatus(f)
    val perm =
      if (s.isDirectory) org.apache.hadoop.fs.permission.FsPermission.getDirDefault
      else org.apache.hadoop.fs.permission.FsPermission.getFileDefault
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getAccessTime, perm, "", "", s.getPath)
  }
}

class CrossNamespaceSpec extends SparkSpec {

  test("sourcePathPrefix: load reads the dump and ext files via the source cluster's fs") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.srcfs.impl", classOf[SrcClusterFs].getName)
    // the two namespaces resolve to genuinely distinct FileSystem roots
    val plainFs = new Path("/").getFileSystem(conf)
    val srcFs = new Path("srcfs:/").getFileSystem(conf)
    assert(srcFs.isInstanceOf[SrcClusterFs], srcFs.getClass)
    assert(plainFs.getClass != srcFs.getClass)

    val root = Files.createTempDirectory("graft-xns").toString
    val source = DbCatalog(spark, s"$root/src")
    source.createDb("xdb")
    source.writeTable("xdb", "region", spark.read.parquet(s"${sf()}/region.parquet"))
    Files.createDirectories(Paths.get(s"$root/src/xdb/ext_logs"))
    Files.writeString(Paths.get(s"$root/src/xdb/ext_logs/p0.txt"), "xns-1")
    val target = DbCatalog(spark, s"$root/tgt")
    // every source-cluster read at load time goes through the srcfs:
    // namespace; the target side stays on the local namespace
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", includeExternalTables = true,
      rerunSleepMs = 10, sourcePathPrefix = "srcfs:")
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)

    assert(job.run("xdb").verify == "SUCCESS")
    assert(target.readTable("xdb", "region").count() ==
      source.readTable("xdb", "region").count())
    assert(Files.readString(Paths.get(s"$root/tgt/xdb/ext_logs/p0.txt")) == "xns-1")

    // incremental across the namespace boundary too
    Thread.sleep(20)
    Files.writeString(Paths.get(s"$root/src/xdb/ext_logs/p0.txt"), "xns-2")
    import DbCatalog._
    source.appendEvents("xdb", Seq(
      Event("region", OpUpsert, "0", """{"r_regionkey":0,"r_name":"X-NS"}""")))
    val r2 = job.run("xdb")
    assert(r2.kind == "incremental" && r2.verify == "SUCCESS")
    assert(target.readTable("xdb", "region")
      .where(col("r_regionkey") === 0 && col("r_name") === "X-NS").count() == 1)
    assert(Files.readString(Paths.get(s"$root/tgt/xdb/ext_logs/p0.txt")) == "xns-2")

    // a dump path already qualified for a DIFFERENT filesystem is refused
    // loudly — blind concatenation would read the wrong cluster
    val loader = Load(spark, target, cfg)
    val e = intercept[IllegalArgumentException] {
      loader.replay(s"file:$root/dumps/xdb/deadbeef")
    }
    assert(e.getMessage.contains("refusing to prepend"), e.getMessage)
  }
}
