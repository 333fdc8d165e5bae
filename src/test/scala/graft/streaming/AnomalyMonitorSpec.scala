package graft.streaming

import graft.SparkSpec
import graft.operators.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class AnomalyMonitorSpec extends SparkSpec {

  private val H = 3600000000L

  test("streamed monitoring equals the batch z-score over all events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-am2").toString

    // alternating 9/11 history then a spike, split ACROSS micro-batches —
    // including one hour (hr 5) whose count is split between batches, so
    // the merge (not just the union) is exercised
    val all = (0L until 13L).flatMap { h =>
      val n = if (h == 12) 20 else if (h % 2 == 0) 9 else 11
      (0 until n).map(i => ("m", h * H + i))
    }
    val (b1, b2) = all.partition { case (_, us) => us < 5 * H + 5 }

    val mem = MemoryStream[(String, Long)]
    val q = AnomalyMonitor.monitorStream(
      mem.toDS().toDF("key", "us"), s"$dir/view", s"$dir/ckpt")
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = AnomalyMonitor.anomalies(spark, s"$dir/view")
      .orderBy("key", "hr").collect().toSeq
    val batch = TimeSeries.rollingZScore(
        all.toDF("key", "us")
          .select(col("key"), expr("us DIV 3600000000").as("hr"))
          .groupBy("key", "hr").agg(count(lit(1)).as("cnt")))
      .orderBy("key", "hr").collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
    // and the spike is flagged
    val spike = streamed.find(_.getAs[Long]("hr") == 12L).get
    assert(spike.getAs[Boolean]("is_anomaly"))
  }

  test("replayed micro-batches are no-ops (exactly-once effect)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-am3").toString
    val vd = s"$dir/view"
    def batch(rows: (String, Long)*) = rows.toDF("key", "us")

    AnomalyMonitor.applyBatch(spark, vd, batch(("m", 0L), ("m", 1L)), 0L)
    AnomalyMonitor.applyBatch(spark, vd, batch(("m", H + 1L)), 1L)
    // replay of batch 1 with bogus content must not double-count
    AnomalyMonitor.applyBatch(spark, vd, batch(("m", H + 1L), ("x", 0L)), 1L)

    val got = AnomalyMonitor.readCounts(spark, vd)
      .orderBy("key", "hr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("m", 0L, 2L), ("m", 1L, 1L)))
  }
}
