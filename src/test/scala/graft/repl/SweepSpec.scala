package graft.repl

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Multi-db concurrent orchestration — the reference's cron-per-db fleet
  * (`/root/reference/README.md:58-62`) as one in-process sweep.
  */
class SweepSpec extends SparkSpec {

  private def world() = {
    val root = java.nio.file.Files.createTempDirectory("graft-sweep").toString
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt")
    (root, source, target)
  }

  private def seed(source: DbCatalog, db: String): Unit = {
    source.createDb(db)
    Seq("region", "nation").foreach { t =>
      source.writeTable(db, t, spark.read.parquet(s"${sf()}/$t.parquet"))
    }
  }

  test("sweep replicates several dbs concurrently; each leaves a run-log row") {
    val (root, source, target) = world()
    val dbs = Seq("swa", "swb", "swc")
    dbs.foreach(seed(source, _))
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val sweep = Sweep(spark, source, target, s"$root/dumps", cfg)

    val out1 = sweep.run(dbs)
    assert(out1.map(_.db) == dbs)
    assert(out1.forall(o => o.report.exists(_.verify == "SUCCESS") && !o.skipped))
    assert(out1.forall(_.report.exists(_.kind == "bootstrap")))
    dbs.foreach { db =>
      assert(target.listTables(db) == Seq("nation", "region"), db)
    }
    // one run-log row per db per attempt
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    dbs.foreach { db =>
      val runs = new Path(s"$root/tgt", s"_repl_metadata/$db/runs")
      assert(fs.exists(runs) && fs.listStatus(runs).nonEmpty, db)
    }

    // second sweep: one db has new events (incremental), others are no-ops
    import DbCatalog._
    source.appendEvents("swb", Seq(
      Event("region", OpUpsert, "0", """{"r_regionkey":0,"r_name":"SWEEP-B"}""")))
    val out2 = sweep.run(dbs)
    val byDb = out2.map(o => o.db -> o).toMap
    assert(byDb("swb").report.exists(r => r.kind == "incremental" && r.verify == "SUCCESS"))
    assert(byDb("swa").report.exists(_.verify == "NOOP"))
    assert(byDb("swc").report.exists(_.verify == "NOOP"))
    assert(target.readTable("swb", "region")
      .where(col("r_name") === "SWEEP-B").count() == 1)
  }

  test("a held per-db lock skips that db only; a failing db fails alone") {
    val (root, source, target) = world()
    Seq("swl", "swm").foreach(seed(source, _))
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val sweep = Sweep(spark, source, target, s"$root/dumps", cfg)

    // another instance holds swl's lock (cron overlap on a shared dump root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = Locks.acquire(fs, new Path(s"$root/dumps", "swl/run.lock"),
      "other-instance", cfg.lockStaleMs)
    try {
      // swx does not exist at the source → that db errors, the rest proceed
      val out = sweep.run(Seq("swl", "swm", "swx"))
      val byDb = out.map(o => o.db -> o).toMap
      assert(byDb("swl").skipped && byDb("swl").report.isEmpty)
      assert(byDb("swm").report.exists(_.verify == "SUCCESS"))
      assert(byDb("swx").error.exists(_.contains("does not exist")))
    } finally lock.release()

    // lock released → swl replicates on the next sweep
    val out2 = sweep.run(Seq("swl"))
    assert(out2.head.report.exists(_.verify == "SUCCESS"))
  }

  test("allowlist filters sweep targets") {
    val (root, source, target) = world()
    Seq("swp", "swq").foreach(seed(source, _))
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10,
      dbAllowlist = Set("swp"))
    val sweep = Sweep(spark, source, target, s"$root/dumps", cfg)
    val out = sweep.run(Seq("swp", "swq"))
    val byDb = out.map(o => o.db -> o).toMap
    assert(byDb("swp").report.exists(_.verify == "SUCCESS"))
    assert(byDb("swq").skipped && byDb("swq").error.isEmpty)
    assert(!target.dbExists("swq"))
  }
}
