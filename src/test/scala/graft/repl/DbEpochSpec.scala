package graft.repl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Db-level read consistency ([[DbEpochs]]): pinned readers see one
  * committed epoch — never the torn state between two table swaps of an
  * in-flight incremental load (the flaw the reference shares,
  * `hive3repl.sh` applies per table too).
  */
class DbEpochSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-epoch-$tag").toString

  private def kv(rows: (Long, String)*): DataFrame = rows.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("mid-load pinned reads: the pre-load epoch survives per-table merges") {
    val cat = DbCatalog(spark, tmp("mid"), epochMode = true)
    cat.createDb("db")
    cat.writeTable("db", "a", kv(1L -> "a1", 2L -> "a2"))
    cat.writeTable("db", "b", kv(1L -> "b1"))
    val epochs = DbEpochs(spark, cat, "db")
    epochs.commit(10L)
    val pinned = epochs.pin()
    assert(pinned.epoch == 0L && pinned.watermark == 10L)
    assert(pinned.tables == Seq("a", "b"))

    // the load's first table swap lands (table a merged) — the db is TORN
    cat.mergeDml("db", "a",
      upserts = kv(2L -> "a2new", 3L -> "a3"),
      deadKeys = Seq("2", "3").toDF("key"))
    assert(rows(cat.readTable("db", "a")) ==
      Set(1L -> "a1", 2L -> "a2new", 3L -> "a3"), "live must see the merge")
    // pinned reader still sees the PRE-load state of BOTH tables
    assert(rows(pinned.readTable("a")) == Set(1L -> "a1", 2L -> "a2"))
    assert(rows(pinned.readTable("b")) == Set(1L -> "b1"))

    // second table swap + epoch commit: the new epoch sees the new state,
    // the old pin still serves the old one (keepEpochs=2 grace)
    cat.mergeDml("db", "b", upserts = kv(1L -> "b1new"),
      deadKeys = Seq("1").toDF("key"))
    epochs.commit(20L)
    val pinned1 = epochs.pin()
    assert(pinned1.epoch == 1L)
    assert(rows(pinned1.readTable("a")) ==
      Set(1L -> "a1", 2L -> "a2new", 3L -> "a3"))
    assert(rows(pinned1.readTable("b")) == Set(1L -> "b1new"))
    assert(rows(pinned.readTable("a")) == Set(1L -> "a1", 2L -> "a2"))
    assert(rows(pinned.readTable("b")) == Set(1L -> "b1"))
  }

  test("partitioned merges stash only affected partitions; pinned reads recompose") {
    val cat = DbCatalog(spark, tmp("part"), epochMode = true)
    cat.createDb("db")
    def part(rows: (Long, String, Long)*): DataFrame =
      rows.toDF("k", "v", "p")
    cat.writeTablePartitioned("db", "t",
      part((1L, "p0a", 0L), (2L, "p0b", 0L), (3L, "p1a", 1L), (4L, "p2a", 2L)), "p")
    val epochs = DbEpochs(spark, cat, "db")
    epochs.commit(1L)
    val pinned = epochs.pin()

    // merge touches partition 0 (update) and creates partition 9
    cat.mergeDml("db", "t",
      upserts = part((2L, "p0bNEW", 0L), (9L, "p9a", 9L)),
      deadKeys = Seq("2", "9").toDF("key"))
    def all(df: DataFrame): Set[(Long, String, Long)] =
      df.select(col("k"), col("v"), col("p").cast("long")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(all(cat.readTable("db", "t")) == Set(
      (1L, "p0a", 0L), (2L, "p0bNEW", 0L), (3L, "p1a", 1L), (4L, "p2a", 2L),
      (9L, "p9a", 9L)))
    // pinned: partition 0 from the stash, 1/2 from live, 9 invisible
    assert(all(pinned.readTable("t")) == Set(
      (1L, "p0a", 0L), (2L, "p0b", 0L), (3L, "p1a", 1L), (4L, "p2a", 2L)))
  }

  test("drops, creates and renames resolve through the epoch manifest and markers") {
    val cat = DbCatalog(spark, tmp("ddl"), epochMode = true)
    cat.createDb("db")
    cat.writeTable("db", "gone", kv(1L -> "g1"))
    cat.writeTable("db", "moved", kv(1L -> "m1"))
    val epochs = DbEpochs(spark, cat, "db")
    epochs.commit(1L)
    val pinned = epochs.pin()

    cat.dropTable("db", "gone")
    cat.renameTableFs("db", "moved", "dst")
    cat.writeTable("db", "fresh", kv(1L -> "f1")) // created after the pin
    assert(rows(pinned.readTable("gone")) == Set(1L -> "g1"),
      "dropped table must stay readable at the pinned epoch")
    assert(rows(pinned.readTable("moved")) == Set(1L -> "m1"),
      "renamed table must resolve through the marker")
    intercept[IllegalArgumentException] { pinned.readTable("fresh") }

    // merge the RENAMED table: pinned old-name reads keep the pre-image
    cat.mergeDml("db", "dst", upserts = kv(1L -> "m1new"),
      deadKeys = Seq("1").toDF("key"))
    assert(rows(pinned.readTable("moved")) == Set(1L -> "m1"))

    epochs.commit(2L)
    val pinned1 = epochs.pin()
    assert(pinned1.tables == Seq("dst", "fresh"))
    assert(rows(pinned1.readTable("dst")) == Set(1L -> "m1new"))
  }

  test("retention: epochs below the floor are pruned and fail loudly") {
    val cat = DbCatalog(spark, tmp("prune"), epochMode = true)
    cat.createDb("db")
    cat.writeTable("db", "t", kv(1L -> "v0"))
    val epochs = DbEpochs(spark, cat, "db") // keepEpochs = 2
    epochs.commit(1L)
    val pinned0 = epochs.pin()
    cat.mergeDml("db", "t", kv(1L -> "v1"), Seq("1").toDF("key"))
    epochs.commit(2L)
    assert(rows(pinned0.readTable("t")) == Set(1L -> "v0"), "within grace")
    cat.mergeDml("db", "t", kv(1L -> "v2"), Seq("1").toDF("key"))
    epochs.commit(3L) // floor moves past epoch 0
    val e = intercept[Exception] { rows(pinned0.readTable("t")) }
    assert(e.getMessage != null)
    // the current pin is unaffected
    assert(rows(epochs.pin().readTable("t")) == Set(1L -> "v2"))
  }

  test("crash after a completed swap: repairTable stashes the backup, not drops it") {
    val cat = DbCatalog(spark, tmp("repair"), epochMode = true)
    cat.createDb("db")
    cat.writeTable("db", "t", kv(1L -> "old"))
    val epochs = DbEpochs(spark, cat, "db")
    epochs.commit(1L)
    val pinned = epochs.pin()
    // manufacture the window: swap COMPLETED (live = merged), bak = the
    // pre-image, crash hit before the stash/cleanup step
    val dbp = cat.dbPath("db")
    val fs = dbp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dbp, "t"),
      new org.apache.hadoop.fs.Path(dbp, "_bak_t")))
    kv(1L -> "new").write.parquet(new org.apache.hadoop.fs.Path(dbp, "t").toString)
    cat.repairTable("db", "t") // next load's crash recovery
    assert(rows(cat.readTable("db", "t")) == Set(1L -> "new"))
    assert(rows(pinned.readTable("t")) == Set(1L -> "old"),
      "the completed swap's backup must reach the epoch stash")
  }

  test("crash between swap renames: repair restores live, the retried merge stashes the pre-image") {
    val cat = DbCatalog(spark, tmp("midswap"), epochMode = true)
    cat.createDb("db")
    cat.writeTable("db", "t", kv(1L -> "old"))
    val epochs = DbEpochs(spark, cat, "db")
    epochs.commit(1L)
    val pinned = epochs.pin()
    var fired = false
    CrashHooks.betweenSwapRenames =
      () => if (!fired) { fired = true; throw new RuntimeException("injected crash") }
    try intercept[RuntimeException] {
      cat.mergeDml("db", "t", kv(1L -> "new"), Seq("1").toDF("key"))
    } finally CrashHooks.betweenSwapRenames = () => ()
    cat.repairTable("db", "t") // live was mid-swap-missing; restore
    assert(rows(cat.readTable("db", "t")) == Set(1L -> "old"))
    cat.mergeDml("db", "t", kv(1L -> "new"), Seq("1").toDF("key")) // retry
    assert(rows(cat.readTable("db", "t")) == Set(1L -> "new"))
    assert(rows(pinned.readTable("t")) == Set(1L -> "old"),
      "the retried merge must stash the restored pre-image")
  }

  test("end-to-end: a verified replication cycle publishes one epoch") {
    val root = tmp("e2e")
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt", epochMode = true)
    source.createDb("db")
    source.writeTable("db", "t", kv(1L -> "v1", 2L -> "v2"))
    val job = ReplicationJob(spark, source, target, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10))
    assert(job.run("db").verify == "SUCCESS") // bootstrap publishes epoch 0
    val epochs = DbEpochs(spark, target, "db")
    val pinned = epochs.pin()
    assert(pinned.epoch == 0L)
    assert(rows(pinned.readTable("t")) == Set(1L -> "v1", 2L -> "v2"))

    source.appendEvents("db", Seq(
      DbCatalog.Event("t", DbCatalog.OpUpsert, "2", """{"k":2,"v":"v2new"}""")))
    assert(job.run("db").verify == "SUCCESS")
    // old pin: pre-load; new pin: post-load, watermark carried
    assert(rows(pinned.readTable("t")) == Set(1L -> "v1", 2L -> "v2"))
    val pinned1 = epochs.pin()
    assert(pinned1.epoch == 1L && pinned1.watermark >= 1L)
    assert(rows(pinned1.readTable("t")) == Set(1L -> "v1", 2L -> "v2new"))
    // a NOOP cycle does not mint a new epoch
    assert(job.run("db").verify == "NOOP")
    assert(epochs.pin().epoch == 1L)
  }
}
