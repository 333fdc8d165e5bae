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
}
