package graft.streaming

import graft.SparkSpec
import graft.streaming.StatefulDedup.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulDedupSpec extends SparkSpec {

  test("first occurrence per key survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sd").toString

    val mem = MemoryStream[Keyed]
    val q = StatefulDedup.run(spark, mem.toDS(), s"$dir/ckpt", "dedup_out")

    mem.addData(Keyed("a", 3), Keyed("a", 1), Keyed("b", 2))
    q.processAllAvailable()
    // duplicate key in a LATER batch must be suppressed by state
    mem.addData(Keyed("a", 9), Keyed("c", 7))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("b", 2L), ("c", 7L)), out)
  }

  test("TopKAggregator equals window top-k") {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(3).toColumn
    val data = Seq(
      (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L), (1L, 0.5, 13L),
      (2L, 0.3, 20L), (2L, 0.7, 21L))
      .toDF("q", "score", "id")
    val viaAgg = data.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .collect().toMap
      .map { case (k, v) => k -> v.map(_._2) }
    // expected: score desc, id asc tiebreak
    assert(viaAgg(1L) == Seq(9L, 10L, 11L))
    assert(viaAgg(2L) == Seq(21L, 20L))
  }
}
