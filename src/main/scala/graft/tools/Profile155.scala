package graft.tools

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the q155 composed signed-curation row —
  * times each stage of the query body separately so the optimization
  * target is measured, not guessed. Dev tool, not part of the driver
  * contract.
  */
object Profile155 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[p155] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import graft.streaming.CurationStream
    val d = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), col("source"))
    // warm up scan/codegen/JIT so stage times are marginal costs
    for (w <- 1 to 2) time(s"warmup$w") {
      d.filter(TextAnalysis.langGuessExpr(col("text")) === "en" &&
        TextAnalysis.qualityKeepExpr(col("text"))).count()
      Dedup.exact(d, col("text"), col("doc_id")).count(); ()
    }
    val eligible = d.filter(
      TextAnalysis.langGuessExpr(col("text")) === "en" &&
      TextAnalysis.qualityKeepExpr(col("text")))
    var keep: org.apache.spark.sql.DataFrame = null
    time("exact-keep") {
      keep = Dedup.exact(eligible, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id"))
      keep.count(); ()
    }
    var ok: org.apache.spark.sql.DataFrame = null
    time("ok-build") {
      ok = Dedup.lshIndexBuild(
        eligible.join(keep, Seq("doc_id"), "left_semi"),
        "text", "doc_id").ok.cache()
      ok.count(); ()
    }
    // leg-1 internals replicated for stage attribution
    locally {
      import graft.operators.Dedup.LshIndex
      var e2: org.apache.spark.sql.DataFrame = null
      var sets: org.apache.spark.sql.DataFrame = null
      var bands: org.apache.spark.sql.DataFrame = null
      time("leg1a-gates-e2") {
        val exactKeep = Dedup.exact(eligible, col("text"), col("doc_id"))
          .select(col("keep_id").as("doc_id"))
        e2 = eligible.join(exactKeep, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("source"), col("text"),
            md5(col("text")).as("hash")).cache()
        e2.count(); ()
      }
      time("leg1b-artifacts") {
        val art = Dedup.lshArtifacts(e2, "text", "doc_id", ok, 3)
        sets = art.sets.cache()
        bands = art.bands
        sets.count(); ()
      }
      time("leg1c-pairsWithin") {
        Dedup.lshPairsWithin(LshIndex(ok, sets, bands), 0.5).count(); ()
      }
      e2.unpersist(); sets.unpersist()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-p155").toString
    time("leg1-insert") {
      CurationStream.applySignedBatchDelta(spark, tmp, ok,
        d.select(lit("I").as("op"), col("doc_id"), col("text"),
          col("source")), batchId = 0L, capN = 15)
    }
    time("leg2-delete") {
      CurationStream.applySignedBatchDelta(spark, tmp, ok,
        d.filter(col("doc_id") % 10 === 3)
          .select(lit("D").as("op"), col("doc_id"), col("text"),
            col("source")), batchId = 1L, capN = 15)
    }
    time("read-result") {
      CurationStream.readDocsDelta(spark, tmp).orderBy(col("doc_id"))
        .collect(); ()
    }
    ok.unpersist()
    spark.stop()
  }
}
