package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}
import graft.util.DeltaView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once across the COUPLED multi-view commit, proven under crash
  * injection, not by argument: CurationStream's three views (docs, sets,
  * bands) share one batchId with a documented crash-window order (docs
  * commits first; replays re-derive accepted ids as batch ∩ docs view).
  * This spec SIGKILLs a real forked JVM BETWEEN view commits — in both
  * windows — and proves the next ordinary trigger converges every view to
  * the sequential reference (the [[graft.repl]] kill-9 merge-swap recipe
  * applied to the streaming plane, closing the round-11 ask).
  */
class CurationCrashSpec extends SparkSpec {

  private def fixtureDocs: DataFrame =
    graft.Tables(spark, sf()).documents
      .select(col("doc_id"), col("text"), col("source"))

  private def okOf(d: DataFrame): DataFrame = {
    val eligible = d.filter(
      TextAnalysis.langGuessExpr(col("text")) === "en" &&
      TextAnalysis.qualityKeepExpr(col("text")))
    val keep = Dedup.exact(eligible, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    Dedup.lshIndexBuild(eligible.join(keep, Seq("doc_id"), "left_semi"),
      "text", "doc_id").ok
  }

  private def snapshot(dir: String): (Seq[String], Seq[String], Seq[String]) = {
    def rows(sub: String, key: Seq[String], schema: org.apache.spark.sql.types.StructType) =
      DeltaView(spark, s"$dir/$sub", key, compactEvery = 8).read()
        .getOrElse(graft.util.Frames.empty(spark, schema))
        .collect().map(_.toString).toSeq.sorted
    (rows("docs", Seq("doc_id"), CurationStream.DocsSchema),
     rows("sets", Seq("doc"), CurationStream.SetsSchema),
     rows("bands", Seq("doc"), CurationStream.BandsSchema))
  }

  private def runWindow(window: String): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-curcrash-$window").toString
    val d = fixtureDocs
    d.write.mode("overwrite").parquet(s"$root/docs_fixture.parquet")

    // fork the victim, wait for it to park INSIDE the window, SIGKILL
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.contains("=ALL-UNNAMED") ||
        a.startsWith("-D") || a.startsWith("-Xmx")).toSeq
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.streaming.CurationCrashVictim", root, window)
    val log = new java.io.File(root, "victim.log")
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    try {
      val marker = java.nio.file.Paths.get(root, "_inwindow")
      val deadline = System.currentTimeMillis() + 240000
      while (!java.nio.file.Files.exists(marker) &&
             System.currentTimeMillis() < deadline && proc.isAlive)
        Thread.sleep(50)
      assert(java.nio.file.Files.exists(marker),
        s"victim never reached the $window window:\n" +
          scala.io.Source.fromFile(log).mkString.takeRight(2000))
      proc.destroyForcibly(); proc.waitFor()
    } finally if (proc.isAlive) { proc.destroyForcibly(); proc.waitFor() }

    // the crash left a TORN multi-view state: views up to and including
    // `window` committed batch 0, later views never committed
    val committedAfter = Seq("docs", "sets", "bands").map { v =>
      v -> DeltaView(spark, s"$root/views/$v",
        if (v == "docs") Seq("doc_id") else Seq("doc"),
        compactEvery = 8).committed.isDefined
    }.toMap
    assert(committedAfter("docs"), "docs view must be committed in both windows")
    if (window == "docs")
      assert(!committedAfter("sets") && !committedAfter("bands"),
        s"expected only docs committed, got $committedAfter")
    else
      assert(committedAfter("sets") && !committedAfter("bands"),
        s"expected docs+sets committed, got $committedAfter")

    // an ordinary replay of the SAME batch (what checkpoint recovery runs)
    // converges the torn state
    val ok = okOf(d).cache()
    CurationStream.applySignedBatchDelta(spark, s"$root/views", ok,
      d.select(lit("I").as("op"), col("doc_id"), col("text"),
        col("source")), batchId = 0L, capN = 15)

    // sequential reference: the same batch applied cleanly in a fresh dir
    val ref = java.nio.file.Files
      .createTempDirectory(s"graft-curcrash-ref-$window").toString
    CurationStream.applySignedBatchDelta(spark, s"$ref/views", ok,
      d.select(lit("I").as("op"), col("doc_id"), col("text"),
        col("source")), batchId = 0L, capN = 15)
    ok.unpersist()

    val got = snapshot(s"$root/views")
    val want = snapshot(s"$ref/views")
    assert(got._1 == want._1, s"docs view diverged after $window crash")
    assert(got._2 == want._2, s"sets view diverged after $window crash")
    assert(got._3 == want._3, s"bands view diverged after $window crash")
    assert(got._1.nonEmpty && got._2.nonEmpty && got._3.nonEmpty,
      "reference run admitted nothing — fixture too small?")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ref))
  }

  test("kill -9 between the docs and sets commits: replay converges") {
    runWindow("docs")
  }

  test("kill -9 between the sets and bands commits: replay converges") {
    runWindow("sets")
  }
}
