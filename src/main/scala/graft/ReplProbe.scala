package graft

import org.apache.spark.sql.SparkSession

/** Phase-level profiling main for the replication path: times dump, load,
  * status and merge separately so a regression in the end-to-end bench
  * numbers can be attributed to a phase (run via
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ReplProbe"`).
  */
object ReplProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import graft.repl._
    val root = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt")
    source.createDb("bench")
    time("setup: write source tables") {
      Tables(spark, sfDir).all.foreach { case (n, df) => source.writeTable("bench", n, df) }
    }
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 100)
    val meta = MetadataStore(spark, target.root)
    val dumper = Dump(spark, source, s"$root/dumps", cfg)
    val loader = Load(spark, target, cfg)

    var dumpPath: String = null
    time("bootstrap: dump") { dumpPath = dumper.bootstrap("bench").path }
    time("bootstrap: load") { loader.replay(dumpPath) }
    time("bootstrap: status") { meta.watermark("bench") }

    val ev = (1 to 1000).map { i =>
      DbCatalog.Event("nation", DbCatalog.OpUpsert, (i % 25).toString,
        s"""{"n_nationkey":${i % 25},"n_name":"N$i","n_regionkey":${i % 5}}""")
    }
    time("incr: append events") { source.appendEvents("bench", ev) }
    var d2: String = null
    time("incr: dump") { d2 = dumper.incremental("bench", meta.watermark("bench").get).path }
    time("incr: load") { loader.replay(d2) }

    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)
    val evFact = (1 to 1000).map { i =>
      DbCatalog.Event("lineitem", DbCatalog.OpUpsert, (i * 7).toString,
        s"""{"l_orderkey":${i * 7},"l_linenumber":1,"l_quantity":$i}""")
    }
    source.appendEvents("bench", evFact)
    time("incr fact: full job.run") { assert(job.run("bench").verify == "SUCCESS") }

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
