package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(Tables(spark, sf("sf0.001")).documents).cache()

  test("mapPartitions batch decode matches the expression-path decode exactly") {
    val exprPath = media.select(col("media_id"),
        Multimodal.fakeDecodeFeatures(col("payload")).as("feature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val batchPath = Multimodal.decodeViaMapPartitions(spark, media)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(exprPath.keySet == batchPath.keySet)
    exprPath.foreach { case (id, f) => assert(f == batchPath(id), s"media $id") }
  }

  test("metadata-only query prunes the binary payload from the parquet scan") {
    // Write media as parquet, then check the scan schema of a metadata query.
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val df = spark.read.parquet(s"$dir/media")
      .groupBy("kind").agg(max(col("meta.width")))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("payload"), s"payload not pruned:\n$scan")
  }

  test("frame sampling emits duration/step frames per video") {
    val frames = Multimodal.sampleFrames(media, 5000)
    val counts = frames.groupBy("media_id").count()
    val expected = media.filter(col("kind") === "video")
      .select(col("media_id"), ceil(col("meta.duration_ms") / 5000.0).as("exp"))
    val bad = counts.join(expected, "media_id")
      .filter(col("count") =!= col("exp")).count()
    assert(bad == 0)
  }
}
