package graft.repl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §7.2 — the minimum end-to-end slice, verbatim: replicate the
  * whole sf0.001 star schema into a target catalog, then run
  * `SELECT count(*), max(l_shipdate) FROM lineitem` on BOTH sides and
  * match — the first-run path of the reference's README transcript
  * (`/root/reference/README.md:64-77`).
  */
class EndToEndSpec extends SparkSpec {

  test("replicate full sf0.001 db, query the target, match the source") {
    val root = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt")
    source.createDb("repltest")
    Tables(spark, sf()).all.foreach { case (n, df) =>
      source.writeTable("repltest", n, df)
    }

    val job = ReplicationJob(spark, source, target, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10))
    val report = job.run("repltest")
    assert(report.kind == "bootstrap" && report.verify == "SUCCESS")

    def probe(cat: DbCatalog) = cat.readTable("repltest", "lineitem")
      .agg(count(lit(1)).as("n"), max(col("l_shipdate")).as("last"))
      .head()
    assert(probe(target) == probe(source))
    assert(probe(target).getLong(0) > 0)

    // all ten tables arrived, row-identical
    Tables.names.foreach { t =>
      assert(
        target.readTable("repltest", t).collect().map(_.toString).sorted.toSeq ==
        source.readTable("repltest", t).collect().map(_.toString).sorted.toSeq, t)
    }
  }

  test("full lifecycle: managed + view + external through bootstrap and incremental") {
    val root = java.nio.file.Files.createTempDirectory("graft-e2e2").toString
    def write(p: String, s: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
    }
    val source = DbCatalog(spark, s"$root/src")
    val target = DbCatalog(spark, s"$root/tgt")
    source.createDb("life")
    source.writeTable("life", "region", spark.read.parquet(s"${sf()}/region.parquet"))
    source.createView("life", "v_regions", "SELECT r_name FROM region ORDER BY r_name")
    write(s"$root/src/life/ext_logs/p0.txt", "raw-0")

    val cfg = ReplConfig(dumpRoot = s"$root/dumps",
      includeExternalTables = true, rerunSleepMs = 10)
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)
    assert(job.run("life").verify == "SUCCESS")
    // every object kind is live at the target and answers queries
    assert(target.readTable("life", "region").count() == 5)
    assert(target.readView("life", "v_regions").collect().map(_.getString(0)).head == "AFRICA")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/tgt/life/ext_logs/p0.txt")))

    // mutate all three kinds, one incremental cycle converges them together
    Thread.sleep(20)
    import DbCatalog._
    source.appendEvents("life", Seq(
      Event("region", OpUpsert, "0", """{"r_regionkey":0,"r_name":"ZFRICA"}"""),
      Event("v_regions", OpCreateView, null,
        "SELECT r_name FROM region ORDER BY r_name DESC")))
    write(s"$root/src/life/ext_logs/p1.txt", "raw-1")
    val r = job.run("life")
    assert(r.kind == "incremental" && r.verify == "SUCCESS")
    val names = target.readView("life", "v_regions").collect().map(_.getString(0))
    assert(names.head == "ZFRICA") // new view order + replayed upsert visible
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/tgt/life/ext_logs/p1.txt")))
  }
}
