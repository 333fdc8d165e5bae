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

  /** Delegating source that gauges how many dbs are inside [[ReplicationJob
    * .run]] at once (the `dbExists` probe runs once at the start of every
    * run; the sleep widens the window so true concurrency is observable).
    */
  private class GaugedSource(inner: DbCatalog,
                             active: java.util.concurrent.atomic.AtomicInteger,
                             maxSeen: java.util.concurrent.atomic.AtomicInteger)
      extends ReplSource {
    override def dbExists(db: String): Boolean = {
      val now = active.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, now))
      try { Thread.sleep(250); inner.dbExists(db) }
      finally active.decrementAndGet()
    }
    override def listTables(db: String): Seq[String] = inner.listTables(db)
    override def isExternal(table: String): Boolean = inner.isExternal(table)
    override def currentTxnId(db: String): Long = inner.currentTxnId(db)
    override def readTable(db: String, table: String) = inner.readTable(db, table)
    override def partitionSpec(db: String, table: String) = inner.partitionSpec(db, table)
    override def readEventsAfter(db: String, fromId: Long) = inner.readEventsAfter(db, fromId)
    override def listViews(db: String): Seq[String] = inner.listViews(db)
    override def viewSql(db: String, name: String) = inner.viewSql(db, name)
    override def sourceDbPath(db: String): String = inner.sourceDbPath(db)
  }

  test("sweepMaxConcurrent bounds how many dbs replicate at once") {
    import java.util.concurrent.atomic.AtomicInteger
    val (root, source, target) = world()
    val dbs = Seq("swc1", "swc2", "swc3", "swc4")
    dbs.foreach(seed(source, _))

    // unbounded-ish control first: with the bound at the db count, the
    // gauge must actually SEE overlap (proves the probe detects concurrency)
    val (active1, max1) = (new AtomicInteger, new AtomicInteger)
    val wide = Sweep(spark, new GaugedSource(source, active1, max1), target,
      s"$root/dumps", ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10,
        sweepMaxConcurrent = 4))
    assert(wide.run(dbs).forall(_.report.exists(_.verify == "SUCCESS")))
    assert(max1.get >= 3, s"gauge saw only ${max1.get} concurrent dbs")

    // bounded run: never more than 2 in flight, same outcomes
    val (active2, max2) = (new AtomicInteger, new AtomicInteger)
    val bounded = Sweep(spark, new GaugedSource(source, active2, max2), target,
      s"$root/dumps", ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10,
        sweepMaxConcurrent = 2))
    assert(bounded.run(dbs).forall(_.report.exists(_.verify == "NOOP")))
    assert(max2.get <= 2, s"bound violated: ${max2.get} concurrent dbs")
  }

  test("polled sweep: an allowlist replicates continuously from one session") {
    import DbCatalog._
    val (root, source, target) = world()
    val dbs = Seq("swp1", "swp2")
    dbs.foreach(seed(source, _))
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val sweep = Sweep(spark, source, target, s"$root/dumps", cfg)
    // bootstrap pass, then both change logs grow
    assert(sweep.run(dbs).forall(_.report.exists(_.verify == "SUCCESS")))
    source.appendEvents("swp1", Seq(
      Event("region", OpUpsert, "0", """{"r_regionkey":0,"r_name":"P1"}""")))
    source.appendEvents("swp2", Seq(
      Event("region", OpUpsert, "1", """{"r_regionkey":1,"r_name":"P2"}"""),
      Event("region", OpDelete, "2", null)))

    // one polled pass over the whole allowlist from one session
    val queries = sweep.runPolled(dbs, s"$root/ckpt")
    queries.foreach { q => q.awaitTermination(60000); q.stop() }

    assert(target.readTable("swp1", "region")
      .where(col("r_name") === "P1").count() == 1)
    val r2 = target.readTable("swp2", "region")
    assert(r2.where(col("r_name") === "P2").count() == 1)
    assert(r2.where(col("r_regionkey") === 2).isEmpty)
    // both watermarks converged to their source txn ids
    dbs.foreach { db =>
      assert(target.watermark(db).contains(source.currentTxnId(db)), db)
    }
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
