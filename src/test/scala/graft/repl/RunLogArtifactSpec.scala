package graft.repl

import org.apache.spark.sql.functions._
import graft.{ReplMain, SparkSpec, Tables}

/** Per-run log-file artifact (`ReplConfig.runLogDir`) — B10 parity with the
  * reference's upload of each run's log file to an HDFS logs directory
  * (`misc_functions.sh:115-149`).
  */
class RunLogArtifactSpec extends SparkSpec {

  test("each run writes one JSON artifact to runLogDir; failure there is non-fatal") {
    val root = java.nio.file.Files.createTempDirectory("graft-runlog").toString
    val db = "rldb"
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt")
    source.createDb(db)
    source.writeTable(db, "region",
      Tables(spark, sf()).region.select(col("r_regionkey"), col("r_name")))
    val logs = s"$root/logs"
    val job = ReplicationJob(spark, source, target, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", runLogDir = Some(logs)))

    assert(job.run(db).verify == "SUCCESS") // bootstrap
    source.appendEvents(db, Seq(DbCatalog.Event("region", DbCatalog.OpUpsert,
      "0", """{"r_regionkey":0,"r_name":"AFRIKA"}""")))
    assert(job.run(db).verify == "SUCCESS") // incremental

    val files = new java.io.File(logs).listFiles().toSeq.map(_.getName)
      .filterNot(_.startsWith(".")).sorted // drop checksum sidecars
    assert(files.size == 2, s"expected 2 artifacts, got $files")
    assert(files.exists(_.startsWith(s"${db}_bootstrap_")))
    assert(files.exists(_.startsWith(s"${db}_incremental_")))
    val body = scala.io.Source.fromFile(
      s"$logs/${files.find(_.startsWith(s"${db}_incremental_")).get}").mkString
    for (frag <- Seq(s""""db":"$db"""", """"kind":"incremental"""",
        """"verify":"SUCCESS"""", """"tables":["""))
      assert(body.contains(frag), s"artifact missing $frag: $body")

    // An unwritable artifact dir must not fail a verified cycle.
    source.appendEvents(db, Seq(DbCatalog.Event("region", DbCatalog.OpUpsert,
      "1", """{"r_regionkey":1,"r_name":"AMERIKA"}""")))
    val badJob = ReplicationJob(spark, source, target, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", runLogDir = Some("/proc/no-such/logs")))
    assert(badJob.run(db).verify == "SUCCESS")
  }

  test("RunReport.json escapes db and table names (quotes, newlines)") {
    val r = RunReport("""we"ird""", "incremental", 1, 2, 1, "SUCCESS", 10,
      Seq(TableMergeStats("ta\"ble\n", 1, 2, 3)))
    val json = r.json
    assert(json.contains(""""db":"we\"ird""""))
    assert(json.contains(""""table":"ta\"ble\n""""))
    assert(!json.contains("ta\"ble\n")) // no raw control chars / quotes
  }

  test("ReplMain parseConfig accepts runLogDir") {
    val (cfg, _) = ReplMain.parseConfig(ReplConfig(dumpRoot = "/tmp/d"),
      Seq("runLogDir=/tmp/logs"))
    assert(cfg.runLogDir.contains("/tmp/logs"))
    val (cfg2, _) = ReplMain.parseConfig(ReplConfig(dumpRoot = "/tmp/d"),
      Seq("runLogDir="))
    assert(cfg2.runLogDir.isEmpty)
  }
}
